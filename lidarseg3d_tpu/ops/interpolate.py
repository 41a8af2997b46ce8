"""Point devoxelization: 3-NN inverse-distance interpolation of voxel features.

TPU-native replacement for the pointnet2 CUDA three_nn/three_interpolate pair
(/root/reference/det3d/ops/pointnet2_batch, used via
det3d/models/point_heads/point_utils.py:8-52). Instead of a brute-force
O(N*V) scan, the default path exploits the voxel grid itself: the 3 nearest
active-voxel centers to a point are (essentially always) inside the point's
3x3x3 voxel neighborhood, so we look up 27 candidates in the dense table and
keep the best 3 by squared distance — O(27*N) with gathers instead of a
distance matrix. Weights are 1/(d^2 + 1e-8), normalized (the CUDA three_nn
returns squared distances, which the reference feeds to the reciprocal).

`exact_three_nn` (chunked brute force) is provided for tests / parity checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import coords as coord_ops
from . import sparse as sp


def _point_voxel_coords(points_xyz, voxel_size, point_cloud_range):
    """xyz points -> integer voxel coords in (z, y, x) order."""
    vs = jnp.asarray(voxel_size, dtype=jnp.float32)
    org = jnp.asarray(point_cloud_range[:3], dtype=jnp.float32)
    cxyz = jnp.floor((points_xyz - org[None, None, :]) / vs[None, None, :])
    return cxyz[..., ::-1].astype(jnp.int32)


def grid_three_interpolate(
    points_xyz,
    point_valid,
    struct: sp.SparseStructure,
    features,
    voxel_size,
    point_cloud_range,
    table=None,
    k=3,
):
    """Interpolate voxel features at point locations via the 27-neighborhood.

    points_xyz: [B, N, 3] metric xyz; point_valid: [B, N] bool.
    struct/features: the stride-1 sparse tensor ([B, V, C]).
    Returns [B, N, C].
    """
    B, N, _ = points_xyz.shape
    V = struct.capacity
    C = features.shape[-1]
    if table is None:
        table = sp.dense_table(struct)
    centers = sp.voxel_centers(struct, voxel_size, point_cloud_range)  # [B,V,3]
    centers_flat = jnp.concatenate(
        [centers.reshape(B * V, 3), jnp.zeros((1, 3), centers.dtype)], axis=0
    )
    pv = _point_voxel_coords(points_xyz, voxel_size, point_cloud_range)

    deltas = jnp.asarray(np.array(sp.make_offsets(3), np.int32) - 1)  # [27,3]

    def one(delta):
        q = pv + delta[None, None, :]
        idx, found = coord_ops.lookup_coords(
            table, q, struct.spatial_shape, extra_valid=point_valid
        )
        gidx = sp.flatten_indices(idx, found, V)  # [B, N]
        cand = jnp.take(centers_flat, gidx.reshape(-1), axis=0).reshape(B, N, 3)
        d2 = jnp.sum((points_xyz - cand) ** 2, axis=-1)
        return jnp.where(found, d2, jnp.inf), gidx

    cand_d, cand_i = jax.vmap(one)(deltas)  # [27, B, N]

    # Far-point fallback (VERDICT r3 item 6): a point whose 3x3x3
    # neighborhood holds no active voxel (capacity-dropped voxels,
    # out-of-range points) would get ZERO features where the reference's
    # three_nn finds the 3 global nearest. The rank table gives the two
    # raster-order nearest active voxels for free — rank(cell)-1 is the
    # largest active cell <= the point's own cell even on a MISS — so
    # append them as extra candidates with their true distances: when the
    # 27-neighborhood hits, they lose the top-k; when it misses, the point
    # gets real (nearest-in-key-order) voxel features instead of zeros.
    if isinstance(table, coord_ops.RankTable):
        # only points with ZERO grid candidates use the fallback (otherwise
        # a fallback row could duplicate a grid candidate and double-count
        # its weight in the top-k)
        missed = ~jnp.any(jnp.isfinite(cand_d), axis=0)  # [B, N]
        nv = struct.num_voxels  # [B]
        rank_m1, _ = coord_ops.lookup_rank(table, pv, extra_valid=point_valid)
        offs = (jnp.arange(B, dtype=jnp.int32) * V)[:, None]
        extras = []
        for rr in (rank_m1, rank_m1 + 1):
            row = jnp.clip(rr, 0, jnp.maximum(nv[:, None] - 1, 0))
            ok = missed & point_valid & (nv[:, None] > 0)
            gidx = jnp.where(ok, row + offs, B * V).astype(jnp.int32)
            cand = jnp.take(centers_flat, gidx.reshape(-1), axis=0
                            ).reshape(B, N, 3)
            d2 = jnp.sum((points_xyz - cand) ** 2, axis=-1)
            extras.append((jnp.where(ok, d2, jnp.inf), gidx))
        cand_d = jnp.concatenate(
            [cand_d] + [d[None] for d, _ in extras], axis=0)
        cand_i = jnp.concatenate(
            [cand_i] + [i[None] for _, i in extras], axis=0)

    neg_top, arg = jax.lax.top_k(-jnp.moveaxis(cand_d, 0, -1), k)  # [B, N, k]
    best_d = jnp.moveaxis(-neg_top, -1, 0)  # [k, B, N]
    best_i = jnp.moveaxis(
        jnp.take_along_axis(jnp.moveaxis(cand_i, 0, -1), arg, axis=-1), -1, 0
    )

    feats_flat = sp._flat_features(features)  # [B*V + 1, C]
    recip = jnp.where(jnp.isfinite(best_d), 1.0 / (best_d + 1e-8), 0.0)  # [k,B,N]
    norm = jnp.sum(recip, axis=0)
    w = recip / jnp.maximum(norm, 1e-12)
    out = jnp.zeros((B, N, C), dtype=features.dtype)
    for j in range(k):
        g = jnp.take(feats_flat, best_i[j].reshape(-1), axis=0).reshape(B, N, C)
        out = out + g * w[j][..., None]
    return out * point_valid[..., None].astype(out.dtype)


def exact_three_nn(points_xyz, ref_xyz, ref_valid, k=3, chunk=4096):
    """Brute-force k-NN (squared distances), chunked over the reference set.

    points_xyz: [N, 3]; ref_xyz: [V, 3]; ref_valid: [V] bool.
    Returns (d2 [N, k], idx [N, k]).
    """
    N = points_xyz.shape[0]
    V = ref_xyz.shape[0]
    best_d = jnp.full((N, k), jnp.inf, dtype=jnp.float32)
    best_i = jnp.full((N, k), V, dtype=jnp.int32)

    nchunks = -(-V // chunk)
    pad = nchunks * chunk - V
    ref_p = jnp.pad(ref_xyz, ((0, pad), (0, 0)))
    val_p = jnp.pad(ref_valid, (0, pad))

    def body(c, carry):
        bd, bi = carry
        r = jax.lax.dynamic_slice(ref_p, (c * chunk, 0), (chunk, 3))
        v = jax.lax.dynamic_slice(val_p, (c * chunk,), (chunk,))
        d2 = jnp.sum((points_xyz[:, None, :] - r[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(v[None, :], d2, jnp.inf)
        idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        alld = jnp.concatenate([bd, d2], axis=1)
        alli = jnp.concatenate([bi, jnp.broadcast_to(idx[None, :], (N, chunk))], axis=1)
        nd, sel = jax.lax.top_k(-alld, k)
        return (-nd, jnp.take_along_axis(alli, sel, axis=1))

    best_d, best_i = jax.lax.fori_loop(0, nchunks, body, (best_d, best_i))
    return best_d, best_i
