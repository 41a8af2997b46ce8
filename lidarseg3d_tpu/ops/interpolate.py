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
    pv = _point_voxel_coords(points_xyz, voxel_size, point_cloud_range)

    if isinstance(table, (coord_ops.RankTable, coord_ops.KeyTable)):
        return _grid_interp_sorted(
            points_xyz, point_valid, struct, features, voxel_size,
            point_cloud_range, table, pv, k)

    # oracle path (dense / hash tables): 27 per-delta lookups + gathered
    # candidate centers
    centers = sp.voxel_centers(struct, voxel_size, point_cloud_range)  # [B,V,3]
    centers_flat = jnp.concatenate(
        [centers.reshape(B * V, 3), jnp.zeros((1, 3), centers.dtype)], axis=0
    )
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
    return _interp_from_candidates(
        cand_d, cand_i, features, point_valid, k)


def _interp_from_candidates(cand_d, cand_i, features, point_valid, k):
    """Top-k inverse-distance blend of candidate voxel features.

    cand_d/cand_i: [NC, B, N] squared distances (inf = miss) and GLOBAL
    flat feature rows. Candidate-axis order is the tie-break order (raster
    deltas, fallbacks last) — kept identical across all lookup paths.
    """
    B, N = cand_d.shape[1:]
    C = features.shape[-1]
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


def _grid_interp_sorted(points_xyz, point_valid, struct, features,
                        voxel_size, point_cloud_range, table, pv, k):
    """Rank/Key-table fast path: sort points by cell key once, resolve all
    27 candidates with NINE grouped triple-lookups (sparse.py
    _lookup_rank3_groups — the Pallas sorted-stream / merge kernels apply,
    vs 27 XLA element gathers), compute candidate centers ANALYTICALLY
    (a found candidate's voxel coords are exactly pv + delta, so no
    [B*V,3] center gathers at all), blend in sorted space, and un-permute
    the final features with one row scatter.

    Replaces the 27-lookup + 27-center-gather formulation measured at
    45.9 ms of the 48.8 ms semnusc flagship point head
    (tools/bench/mb_head_stages.py).
    """
    B, N, _ = points_xyz.shape
    V = struct.capacity
    Z, Y, X = (int(s) for s in struct.spatial_shape)

    # sort points by extended cell key (invalid/out-of-range points go
    # last) so the grouped lookup streams are monotone per tile
    inb = jnp.all(
        (pv >= 0) & (pv < jnp.asarray([Z, Y, X], pv.dtype)), axis=-1
    ) & point_valid
    cell = (pv[..., 0] * Y + pv[..., 1]) * (X + 2) + (pv[..., 2] + 1)
    sort_key = jnp.where(inb, cell, np.int32(2**31 - 1))
    perm = jnp.argsort(sort_key, axis=-1)  # [B, N]
    pv_s = jnp.take_along_axis(pv, perm[..., None], axis=1)
    pxyz_s = jnp.take_along_axis(points_xyz, perm[..., None], axis=1)
    valid_s = jnp.take_along_axis(point_valid, perm, axis=1)

    # nine (dz, dy) groups; each triple-lookup covers dx in {-1, 0, 1}
    d = np.array([(dz - 1, dy - 1, 0) for dz in range(3) for dy in range(3)],
                 np.int32)
    qc = pv_s[None] + jnp.asarray(d)[:, None, None, :]  # [9, B, N, 3]
    gvalid = jnp.broadcast_to(valid_s[None], qc.shape[:-1])
    (im, fm), (i0, f0), (ip, fp) = sp._lookup_rank3_groups(table, qc, gvalid)

    # candidates in raster (dz, dy, dx) order, exactly as the oracle path
    idx27 = jnp.stack([im, i0, ip], axis=1).reshape(27, B, N)
    fnd27 = jnp.stack([fm, f0, fp], axis=1).reshape(27, B, N)
    offs = (jnp.arange(B, dtype=jnp.int32) * V)[None, :, None]
    gidx27 = jnp.where(fnd27, idx27 + offs, B * V).astype(jnp.int32)

    # analytic candidate centers: found candidate's coords == pv_s + delta
    vs = jnp.asarray(voxel_size, dtype=jnp.float32)  # (vx, vy, vz)
    org = jnp.asarray(point_cloud_range[:3], dtype=jnp.float32)
    dx = np.tile(np.array([-1, 0, 1], np.int32), 9)  # [27]
    dzyx = np.concatenate(
        [np.repeat(d[:, :2], 3, axis=0), dx[:, None]], axis=1)  # [27, 3]
    cand_zyx = (pv_s[None].astype(jnp.float32)
                + jnp.asarray(dzyx, jnp.float32)[:, None, None, :])
    cand_ctr = (cand_zyx[..., ::-1] + 0.5) * vs + org  # [27, B, N, 3] xyz
    d2 = jnp.sum((pxyz_s[None] - cand_ctr) ** 2, axis=-1)
    cand_d = jnp.where(fnd27, d2, jnp.inf)

    # Far-point fallback (VERDICT r3 item 6): a point whose 3x3x3
    # neighborhood holds no active voxel (capacity-dropped voxels,
    # out-of-range points) would get ZERO features where the reference's
    # three_nn finds the 3 global nearest. The center group's raw i0 is
    # rank-1 even on a MISS — the largest active cell <= the point's own
    # cell in raster order — so append it and its successor as extra
    # candidates with their true (gathered-center) distances: when the
    # 27-neighborhood hits they lose the top-k; when it misses the point
    # gets real nearest-in-key-order voxel features instead of zeros.
    centers = sp.voxel_centers(struct, voxel_size, point_cloud_range)
    centers_flat = jnp.concatenate(
        [centers.reshape(B * V, 3), jnp.zeros((1, 3), centers.dtype)], axis=0
    )
    missed = ~jnp.any(jnp.isfinite(cand_d), axis=0)  # [B, N]
    nv = struct.num_voxels  # [B]
    rank_m1 = i0[4]  # center (dz, dy) group: rank-1 at the point's cell
    offs2 = offs[0]
    extras_d, extras_i = [], []
    for rr in (rank_m1, rank_m1 + 1):
        row = jnp.clip(rr, 0, jnp.maximum(nv[:, None] - 1, 0))
        ok = missed & valid_s & (nv[:, None] > 0)
        gidx = jnp.where(ok, row + offs2, B * V).astype(jnp.int32)
        cand = jnp.take(centers_flat, gidx.reshape(-1), axis=0
                        ).reshape(B, N, 3)
        dd = jnp.sum((pxyz_s - cand) ** 2, axis=-1)
        extras_d.append(jnp.where(ok, dd, jnp.inf))
        extras_i.append(gidx)
    cand_d = jnp.concatenate([cand_d] + [x[None] for x in extras_d], axis=0)
    gidx27 = jnp.concatenate([gidx27] + [x[None] for x in extras_i], axis=0)

    out_s = _interp_from_candidates(cand_d, gidx27, features, valid_s, k)
    # un-permute: one [B, N, C] row scatter back to input point order
    out = jnp.zeros_like(out_s)
    return jax.vmap(lambda o, p, v: o.at[p].set(v))(out, perm, out_s)


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
