"""Sparse 3D convolution as gather->GEMM over hashed voxel sets.

TPU-native replacement for spconv (SubMConv3d / SparseConv3d /
SparseInverseConv3d used by /root/reference/det3d/models/backbones/scn_unet.py).
Instead of building explicit rulebook pair lists, we exploit the fact that for
every kernel offset each output voxel has AT MOST ONE input partner, so a
sparse conv is K gathers + K matmuls with no scatter:

    out[b, j] = sum_k  W[k] @ features[b, lookup(out_coord[b, j] -> offset k)]

Misses gather a zero padding row. Everything is static-shape; batches use
per-sample capacity padding [B, V, ...].

Output-site rule for strided conv: we use the decimation rule
``out = floor(in / stride)`` (Minkowski-style) rather than spconv's full
receptive-field union. Every input voxel still contributes to some output;
only outputs whose stride-block is empty (but whose 3x3x3 halo is not) are
omitted. The decoder's inverse convs restore the exact stored coordinate
sets, so final voxel sites are identical to the reference.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import coords as coord_ops


def _triple(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


@struct.dataclass
class SparseStructure:
    """A padded active-voxel coordinate set + its hash table."""

    coords: jnp.ndarray  # [B, V, 3] int32 (z, y, x); invalid rows = -1
    num_voxels: jnp.ndarray  # [B] int32
    sorted_keys: jnp.ndarray  # [B, V] int32 (INVALID_KEY padding)
    sort_perm: jnp.ndarray  # [B, V] int32
    spatial_shape: tuple = struct.field(pytree_node=False)  # (Z, Y, X)

    @property
    def capacity(self):
        return self.coords.shape[1]

    @property
    def batch_size(self):
        return self.coords.shape[0]

    def valid_mask(self):
        V = self.coords.shape[1]
        return (
            jnp.arange(V, dtype=jnp.int32)[None, :] < self.num_voxels[:, None]
        )


@struct.dataclass
class SparseTensor:
    structure: SparseStructure
    features: jnp.ndarray  # [B, V, C]

    @property
    def coords(self):
        return self.structure.coords

    @property
    def num_voxels(self):
        return self.structure.num_voxels

    @property
    def spatial_shape(self):
        return self.structure.spatial_shape

    def valid_mask(self):
        return self.structure.valid_mask()


def build_structure(coords, num_voxels, spatial_shape):
    """Create a SparseStructure from (possibly unsorted) padded coords."""
    coord_ops.check_shape_fits_int32(spatial_shape)
    sorted_keys, perm = coord_ops.build_hash_table(coords, num_voxels, spatial_shape)
    return SparseStructure(
        coords=coords.astype(jnp.int32),
        num_voxels=num_voxels.astype(jnp.int32),
        sorted_keys=sorted_keys,
        sort_perm=perm,
        spatial_shape=tuple(int(s) for s in spatial_shape),
    )


def make_offsets(kernel_size):
    """Kernel taps in (z, y, x) raster order; offset = tap index (0-based)."""
    kz, ky, kx = _triple(kernel_size)
    return list(itertools.product(range(kz), range(ky), range(kx)))


def _gather_rows(feat_ext, idx):
    """feat_ext [B, V+1, C], idx [B, Q] -> [B, Q, C]."""
    return jnp.take_along_axis(feat_ext, idx[..., None], axis=1)


def _pad_features(features):
    B, V, C = features.shape
    zero = jnp.zeros((B, 1, C), dtype=features.dtype)
    return jnp.concatenate([features, zero], axis=1)


def gather_gemm(feat_ext, idx_list, weights, group=9, out_dtype=jnp.float32):
    """sum_k take(feat_ext, idx_list[k]) @ weights[k], grouped for the MXU.

    feat_ext: [B, V_in + 1, Cin] (last row zeros)
    idx_list: K arrays [B, V_out] int32 (misses -> V_in)
    weights: [K, Cin, Cout]
    """
    K, Cin, Cout = weights.shape
    assert len(idx_list) == K
    B, Vout = idx_list[0].shape
    acc = None
    for g0 in range(0, K, group):
        g = min(group, K - g0)
        idx = jnp.stack(idx_list[g0 : g0 + g], axis=-1)  # [B, Vout, g]
        gathered = jnp.take_along_axis(
            feat_ext[:, :, None, :], idx[..., None], axis=1
        )  # [B, Vout, g, Cin]
        gathered = gathered.reshape(B, Vout, g * Cin)
        w = weights[g0 : g0 + g].reshape(g * Cin, Cout)
        part = jnp.einsum(
            "bvc,co->bvo", gathered, w, preferred_element_type=out_dtype
        )
        acc = part if acc is None else acc + part
    return acc


def subm_conv(st: SparseTensor, weights, kernel_size=3, group=9):
    """Submanifold sparse conv: output sites == input sites.

    weights: [K, Cin, Cout] with K = prod(kernel_size), taps in raster order.
    Returns features [B, V, Cout].
    """
    ks = _triple(kernel_size)
    offsets = make_offsets(ks)
    center = np.array([k // 2 for k in ks], dtype=np.int32)
    s = st.structure
    feat_ext = _pad_features(st.features)
    valid = s.valid_mask()  # padded rows are (-1,-1,-1); an offset of +1 would
    # otherwise alias them onto the real voxel at the origin
    idx_list = []
    for off in offsets:
        delta = np.array(off, dtype=np.int32) - center
        q = s.coords + jnp.asarray(delta)[None, None, :]
        qkeys = coord_ops.make_query_keys(q, s.spatial_shape, extra_valid=valid)
        idx, _ = coord_ops.lookup(s.sorted_keys, s.sort_perm, qkeys)
        idx_list.append(idx)
    return gather_gemm(feat_ext, idx_list, weights, group=group)


def downsample_structure(st_struct: SparseStructure, stride, capacity):
    """Output sites for a strided conv: unique(floor(coords / stride))."""
    sz, sy, sx = _triple(stride)
    in_shape = st_struct.spatial_shape
    out_shape = tuple(-(-d // s) for d, s in zip(in_shape, (sz, sy, sx)))
    stride_arr = jnp.asarray([sz, sy, sx], dtype=jnp.int32)
    down = st_struct.coords // stride_arr[None, None, :]
    valid = st_struct.valid_mask()
    out_coords, out_num, ukeys = coord_ops.unique_coords(
        down, valid, out_shape, capacity
    )
    perm = jnp.broadcast_to(
        jnp.arange(capacity, dtype=jnp.int32)[None, :], ukeys.shape
    )
    return SparseStructure(
        coords=out_coords,
        num_voxels=out_num,
        sorted_keys=ukeys,
        sort_perm=perm,
        spatial_shape=out_shape,
    )


def strided_conv(
    st: SparseTensor,
    out_struct: SparseStructure,
    weights,
    kernel_size=3,
    stride=2,
    padding=1,
    group=9,
):
    """Strided sparse conv onto a precomputed output structure.

    For output voxel o and tap k: input coord = o*stride + k - padding.
    """
    ks = _triple(kernel_size)
    sz = _triple(stride)
    pad = _triple(padding)
    s_in = st.structure
    feat_ext = _pad_features(st.features)
    stride_arr = jnp.asarray(sz, dtype=jnp.int32)
    idx_list = []
    for off in make_offsets(ks):
        delta = np.array(off, dtype=np.int32) - np.array(pad, dtype=np.int32)
        q = out_struct.coords * stride_arr[None, None, :] + jnp.asarray(delta)[
            None, None, :
        ]
        # invalid output rows have coords=-1 -> q may still be in-bounds;
        # mask them explicitly
        qkeys = coord_ops.make_query_keys(
            q, s_in.spatial_shape, extra_valid=out_struct.valid_mask()
        )
        idx, _ = coord_ops.lookup(s_in.sorted_keys, s_in.sort_perm, qkeys)
        idx_list.append(idx)
    return gather_gemm(feat_ext, idx_list, weights, group=group)


def inverse_conv(
    st_low: SparseTensor,
    target_struct: SparseStructure,
    weights,
    kernel_size=3,
    stride=2,
    padding=1,
    group=9,
):
    """Inverse (transposed) sparse conv back onto a stored high-res structure.

    For target (output) voxel t and tap k: source coord
    d = (t + padding - k) / stride, valid iff the division is exact. This is
    the exact transpose of :func:`strided_conv`'s gather pattern, i.e.
    spconv's SparseInverseConv3d indice_key reuse.
    """
    ks = _triple(kernel_size)
    sz = np.array(_triple(stride), dtype=np.int32)
    pad = np.array(_triple(padding), dtype=np.int32)
    s_low = st_low.structure
    feat_ext = _pad_features(st_low.features)
    tvalid = target_struct.valid_mask()
    idx_list = []
    for off in make_offsets(ks):
        num = target_struct.coords + jnp.asarray(
            pad - np.array(off, dtype=np.int32)
        )[None, None, :]
        exact = jnp.all(num % jnp.asarray(sz)[None, None, :] == 0, axis=-1)
        q = num // jnp.asarray(sz)[None, None, :]
        qkeys = coord_ops.make_query_keys(
            q, s_low.spatial_shape, extra_valid=exact & tvalid
        )
        idx, _ = coord_ops.lookup(s_low.sorted_keys, s_low.sort_perm, qkeys)
        idx_list.append(idx)
    return gather_gemm(feat_ext, idx_list, weights, group=group)


def voxel_centers(st_struct: SparseStructure, voxel_size, point_cloud_range):
    """Metric-space centers of active voxels (zyx coords -> xyz centers).

    Mirrors common_utils.get_voxel_centers used at scn_unet.py:243-247.
    Invalid rows produce garbage positions; mask with valid_mask().
    """
    vs = jnp.asarray(voxel_size, dtype=jnp.float32)  # (vx, vy, vz)
    org = jnp.asarray(point_cloud_range[:3], dtype=jnp.float32)  # (x0, y0, z0)
    zyx = st_struct.coords.astype(jnp.float32)
    xyz_idx = zyx[..., ::-1]  # -> (x, y, z)
    return (xyz_idx + 0.5) * vs[None, None, :] + org[None, None, :]
