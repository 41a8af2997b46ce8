"""PointNet++-style point ops (batch variants).

TPU-native replacements for det3d/ops/pointnet2_batch (CUDA sampling /
ball_query / group_points / interpolate — SURVEY.md §2.4): furthest point
sampling as a lax.fori_loop over running min-distances, ball query as a
masked top-capacity selection, grouping as flat gathers. three_nn /
three_interpolate live in ops/interpolate.py.
"""

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz, valid, num_samples):
    """xyz: [N, 3]; valid: [N] bool. Returns [num_samples] int32 indices.

    Deterministic: starts from the first valid point; padded points are
    never selected (distance forced to -inf).
    """
    N = xyz.shape[0]
    big = jnp.where(valid, jnp.inf, -jnp.inf)

    first = jnp.argmax(valid)  # first valid index

    def body(i, state):
        mind, idxs = state
        last = idxs[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        mind = jnp.minimum(mind, jnp.where(valid, d, -jnp.inf))
        nxt = jnp.argmax(mind)
        idxs = idxs.at[i].set(nxt.astype(jnp.int32))
        return mind, idxs

    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first.astype(jnp.int32))
    mind0 = big
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (mind0, idxs0))
    return idxs


def ball_query(centers, xyz, valid, radius, nsample):
    """centers: [M, 3]; xyz: [N, 3]; valid: [N] bool.

    Returns (idx [M, nsample] int32, count [M]): for each center, up to
    nsample point indices within radius (first-by-index, as the CUDA kernel);
    slots beyond count repeat the first hit (CUDA semantics) or 0 if none.
    """
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    inside = (d2 < radius ** 2) & valid[None, :]
    # rank hits by index: k-th hit = index of the k-th True
    order = jnp.cumsum(inside, axis=1)  # [M, N] 1-based rank for hits
    N = xyz.shape[0]

    def per_center(ins, rank):
        # idx_k = first j with ins[j] and rank[j] == k+1
        tgt = jnp.where(ins & (rank <= nsample), rank, 0)
        scat = jnp.zeros((nsample + 1,), jnp.int32).at[tgt].max(
            jnp.arange(N, dtype=jnp.int32) + 1
        )
        idx = scat[1:] - 1  # -1 = empty slot
        cnt = jnp.minimum(rank[-1], nsample)
        first = jnp.maximum(idx[0], 0)
        return jnp.where(idx >= 0, idx, first), cnt

    idx, cnt = jax.vmap(per_center)(inside, order)
    return idx.astype(jnp.int32), cnt.astype(jnp.int32)


def group_points(features, idx):
    """features: [N, C]; idx: [M, K] -> [M, K, C] (flat gather)."""
    M, K = idx.shape
    return jnp.take(features, idx.reshape(-1), axis=0).reshape(
        M, K, features.shape[-1]
    )
