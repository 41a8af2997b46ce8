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
from . import pallas_lookup as plkup
from . import sparse_pallas as spk

# Fused Pallas kernel policy for the conv entry points below:
#   "auto"  - bf16 fused kernel on TPU, XLA gather path elsewhere (default)
#   "off"   - always the XLA gather path
#   "bf16"  - force the fused kernel (bf16 gathers, fp32 accumulation)
#   "fp32"  - force the fused kernel at Precision.HIGHEST
#   "fp32i" - fp32 fused kernel through the Pallas interpreter (CPU tests)
PALLAS_MODE = "auto"


def set_pallas_mode(mode):
    global PALLAS_MODE
    assert mode in ("auto", "off", "bf16", "fp32", "fp32i")
    PALLAS_MODE = mode


def _pallas_mode():
    if PALLAS_MODE == "auto":
        return "bf16" if jax.default_backend() == "tpu" else None
    if PALLAS_MODE == "off":
        return None
    return PALLAS_MODE


def _fused_conv(features, weights, rulebook, rulebook_t, mode):
    interpret = mode == "fp32i"
    return spk.fused_conv(
        features, weights, rulebook, rulebook_t,
        mode="fp32" if interpret else mode, interpret=interpret,
    )


def _triple(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


@struct.dataclass
class SparseStructure:
    """A padded active-voxel coordinate set (prefix-valid rows)."""

    coords: jnp.ndarray  # [B, V, 3] int32 (z, y, x); invalid rows = -1
    num_voxels: jnp.ndarray  # [B] int32
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
    """Create a SparseStructure from padded coords (any row order)."""
    coord_ops.check_shape_fits_int32(spatial_shape)
    return SparseStructure(
        coords=coords.astype(jnp.int32),
        num_voxels=num_voxels.astype(jnp.int32),
        spatial_shape=tuple(int(s) for s in spatial_shape),
    )


# Coordinate lookup-table kind for rulebook builds:
#   "auto"  - rank table when B * prod(grid) * 4 B fits the budget below,
#             open-addressing hash map otherwise (default)
#   "rank"  - direct-address table of packed cumulative ranks + x-activity
#             bits: the three x-taps of a (dz, dy) kernel group cost ONE
#             element gather (coords.RankTable); memory = dense + ~0.1%.
#             REQUIRES key-sorted voxel rows (row == rank-1), which the host
#             voxelizer (sort default), unique_coords, and every structure
#             this framework builds guarantee
#   "dense" - plain direct-address row-index table (27 gathers per 3^3
#             rulebook; kept for oracle tests)
#   "hash"  - open-addressing hash map (O(16*capacity) slots ~ 8 MB; lookups
#             cost max-probe-length rounds of full-query gathers, measured
#             ~60 ms per 27V queries - the HBM-for-time fallback that
#             unblocks batched training and huge grids)
TABLE_KIND = "auto"
DENSE_TABLE_BUDGET_BYTES = 1 << 31  # 2 GB across the batch


def set_table_kind(kind):
    global TABLE_KIND
    assert kind in ("auto", "rank", "keys", "hash", "dense")
    TABLE_KIND = kind


def dense_table(s: SparseStructure):
    """Lookup table for structure ``s`` (transient; build once per structure
    per forward and share across rulebooks). Despite the legacy name this
    returns the table kind selected by TABLE_KIND."""
    kind = TABLE_KIND
    if kind == "auto":
        Z, Y, X = (int(d) for d in s.spatial_shape)
        # RankTable only while its packed table is VMEM-resident for the
        # sorted-stream lookup kernel; beyond that the sorted-keys merge
        # kernel (no dense table at all) beats both the XLA element-gather
        # fallback (7.2 ns/query) and the dense build cost.
        kind = "rank" if plkup.supported(Z * Y * (X + 2)) else "keys"
    if kind == "hash":
        return coord_ops.build_hash_map(
            s.coords, s.num_voxels, s.spatial_shape
        )
    if kind == "rank":
        return coord_ops.build_rank_table(
            s.coords, s.num_voxels, s.spatial_shape
        )
    if kind == "keys":
        return coord_ops.build_key_table(
            s.coords, s.num_voxels, s.spatial_shape
        )
    return coord_ops.build_dense_table(s.coords, s.num_voxels, s.spatial_shape)


lookup_table = dense_table


def make_offsets(kernel_size):
    """Kernel taps in (z, y, x) raster order; offset = tap index (0-based)."""
    kz, ky, kx = _triple(kernel_size)
    return list(itertools.product(range(kz), range(ky), range(kx)))


def flatten_indices(idx, found, v_in):
    """Per-sample local indices -> global flat indices into [B*V_in + 1, C].

    idx: [B, Q] local row indices (misses arbitrary); found: [B, Q] bool.
    Misses map to the shared zero row at position B*V_in.
    """
    B = idx.shape[0]
    offs = (jnp.arange(B, dtype=jnp.int32) * v_in)[:, None]
    return jnp.where(found, idx + offs, B * v_in).astype(jnp.int32)


def _flat_features(features):
    """[B, V, C] -> [B*V + 1, C] with a trailing zero row for gather misses.

    Flat 2D `take(axis=0)` is the fast gather lowering on TPU (a batched
    take_along_axis compiles to a serial per-row loop; measured 14-70x
    slower). See .claude/skills/verify/SKILL.md for measurement notes.
    """
    B, V, C = features.shape
    flat = features.reshape(B * V, C)
    zero = jnp.zeros((1, C), dtype=features.dtype)
    return jnp.concatenate([flat, zero], axis=0)


def _gather_gemm_core(feat_flat_ext, gidx, weights, out_dtype=jnp.float32):
    """sum_k take(feat_flat_ext, gidx[k]) @ weights[k], scanned over taps.

    feat_flat_ext: [B*V_in + 1, Cin] (last row zeros)
    gidx: [K, B, V_out] int32 GLOBAL flat indices (misses -> B*V_in)
    weights: [K, Cin, Cout]
    Returns [B, V_out, Cout].

    lax.scan keeps the compiled graph tiny (the unrolled form made full-model
    compiles take ~10 minutes); measured runtime is identical because the
    per-tap gathers execute serially either way (see verify SKILL.md).
    """
    K, Cin, Cout = weights.shape
    assert gidx.shape[0] == K
    _, B, Vout = gidx.shape

    def body(acc, kw):
        idx_k, w_k = kw
        g = jnp.take(feat_flat_ext, idx_k.reshape(-1), axis=0)
        part = jnp.einsum("nc,co->no", g, w_k, preferred_element_type=out_dtype)
        return acc + part, None

    acc = jnp.zeros((B * Vout, Cout), out_dtype)
    acc, _ = jax.lax.scan(body, acc, (gidx, weights))
    return acc.reshape(B, Vout, Cout).astype(feat_flat_ext.dtype)


# rematerialized: without checkpointing, scan saves the gathered [B*V, Cin]
# residual of EVERY tap for the backward pass (~0.5 GB per conv at
# SemanticKITTI scale -> train-step OOM); recomputing the gathers in the
# backward trades ~1 extra forward for ~27x less activation memory.
_gather_gemm_remat = jax.checkpoint(_gather_gemm_core, static_argnums=(3,))


def gather_gemm(feat_flat_ext, gidx, weights, out_dtype=jnp.float32):
    if isinstance(gidx, (list, tuple)):
        gidx = jnp.stack(list(gidx))
    return _gather_gemm_remat(feat_flat_ext, gidx, weights, out_dtype)



def _gather_cells(packed, cell, inb):
    """packed [B, NCE]; cell [G, B, V] int32 in [0, NCE); inb [G, B, V].

    Returns packed[b, cell] as [G, B, V]. Dispatches to the sorted-stream
    Pallas kernel (ops/pallas_lookup.py) on TPU when the table fits VMEM
    (measured 3.7-4.8x over XLA's element gather on v5e). Cells at
    inb=False positions may be replaced by any valid cell (their gathered
    value is never consumed) — the kernel path clamps them to the
    per-group max valid cell so the query stream stays monotone and the
    per-tile window spans stay tight.
    """
    B, nce = packed.shape
    G, _, V = cell.shape
    if _pallas_mode() in ("bf16", "fp32") and plkup.supported(nce):
        maxc = jnp.max(jnp.where(inb, cell, 0), axis=-1, keepdims=True)
        cells = jnp.minimum(cell, maxc)
        Vp = -(-V // plkup.TILE_Q) * plkup.TILE_Q
        if Vp != V:
            cells = jnp.pad(
                cells, ((0, 0), (0, 0), (0, Vp - V)), mode="edge"
            )
        stream = cells.transpose(1, 0, 2).reshape(B, G * Vp)
        out = jnp.stack(
            [plkup.lookup_gather(packed[b], stream[b]) for b in range(B)]
        )
        return out.reshape(B, G, Vp)[..., :V].transpose(1, 0, 2)
    flat = packed.reshape(B * nce)
    offs = (jnp.arange(B, dtype=jnp.int32) * nce)[None, :, None]
    return jnp.take(flat, (cell + offs).reshape(-1), axis=0).reshape(cell.shape)


def _merge_cells(table, cell, inb):
    """KeyTable counterpart of _gather_cells: packed rank/activity values
    from the sorted-keys merge kernel (ops/pallas_merge.py); same monotone
    clamping so per-tile anchor spans stay tight. Non-TPU backends use the
    searchsorted oracle (plmerge.merge_gather_xla)."""
    from . import pallas_merge as plmerge

    B = table.keys.shape[0]
    G, _, V = cell.shape
    maxc = jnp.max(jnp.where(inb, cell, 0), axis=-1, keepdims=True)
    cells = jnp.minimum(cell, maxc)
    Vp = -(-V // plmerge.TILE_Q) * plmerge.TILE_Q
    if Vp != V:
        cells = jnp.pad(cells, ((0, 0), (0, 0), (0, Vp - V)), mode="edge")
    stream = cells.transpose(1, 0, 2).reshape(B, G * Vp)
    mode = _pallas_mode()
    if mode in ("bf16", "fp32", "fp32i"):
        out = jnp.stack([
            plmerge.merge_gather(table.keys[b], table.coarse[b],
                                 table.shift, stream[b],
                                 interpret=mode == "fp32i")
            for b in range(B)
        ])
    else:
        out = jax.vmap(plmerge.merge_gather_xla)(
            table.keys, table.num, stream)
    return out.reshape(B, G, Vp)[..., :V].transpose(1, 0, 2)


def _lookup_rank3_groups(table, qc, gvalid):
    """Grouped 3-x-tap rank-table lookup (coords.lookup_rank3 semantics,
    batched over a leading group axis and funneled through ONE gather so
    the Pallas sorted-stream kernel can serve all groups in one call).

    qc: [G, B, V, 3] (z, y, x) with x in the extended range [-1, X];
    gvalid: [G, B, V] per-query validity (row padding, parity, oob z/y).
    Returns ((idx_m, f_m), (idx_0, f_0), (idx_p, f_p)), each [G, B, V].
    """
    Z, Y, X = (int(s) for s in table.spatial_shape)
    z, y, x = qc[..., 0], qc[..., 1], qc[..., 2]
    inb = ((z >= 0) & (z < Z) & (y >= 0) & (y < Y)
           & (x >= -1) & (x <= X) & gvalid)
    cell = (z * Y + y) * (X + 2) + (x + 1)
    return lookup_rank3_cells(table, cell, inb)


def lookup_rank3_cells(table, cell, inb):
    """Core of _lookup_rank3_groups on precomputed extended-cell ids.

    cell: [G, B, V] int32 ids on the x-extended grid ((z*Y+y)*(X+2)+x+1),
    arbitrary where inb is False; inb: [G, B, V] query validity. Callers
    that can form cells arithmetically (e.g. sorted-point devoxelization,
    ops/interpolate.py) avoid materializing a [G, B, V, 3] coordinate
    array whose 3-minor layout pads to 128 lanes on TPU (42x the bytes).
    """
    Z, Y, X = (int(s) for s in table.spatial_shape)
    nce = Z * Y * (X + 2)
    cell = jnp.clip(cell, 0, nce - 1)
    if isinstance(table, coord_ops.KeyTable):
        v = _merge_cells(table, cell, inb)
    else:
        v = _gather_cells(table.packed, cell, inb)
    rank, am, a0, ap = coord_ops._rank_bits(v)
    f = lambda a: inb & (a > 0)
    i32 = lambda a: a.astype(jnp.int32)
    return ((i32(rank - a0 - 1), f(am)),
            (i32(rank - 1), f(a0)),
            (i32(rank + ap - 1), f(ap)))


def build_subm_rulebook(s: SparseStructure, kernel_size=3, table=None):
    """Global gather indices for a submanifold conv on structure ``s``.

    Returns [K, B, V] flat indices into [B*V + 1, C]. Shared by every subm
    conv with the same indice_key (reference semantics: spconv indice_key
    reuse, scn_unet.py:90-159).

    On a RankTable with a 3-wide x kernel dim, each (dz, dy) group of three
    x-taps costs ONE gather (see coords.RankTable).
    """
    ks = _triple(kernel_size)
    V = s.capacity
    if table is None:
        table = dense_table(s)
    valid = s.valid_mask()  # padded rows are (-1,-1,-1); an offset of +1 would
    # otherwise alias them onto the real voxel at the origin

    if isinstance(table, (coord_ops.RankTable, coord_ops.KeyTable)) \
            and ks[2] == 3:
        kz, ky, _ = ks
        d = np.array([(dz - kz // 2, dy - ky // 2, 0)
                      for dz in range(kz) for dy in range(ky)], np.int32)
        qc = s.coords[None] + jnp.asarray(d)[:, None, None, :]  # [G,B,V,3]
        gvalid = jnp.broadcast_to(valid[None], qc.shape[:-1])
        (im, fm), (i0, f0), (ip, fp) = _lookup_rank3_groups(
            table, qc, gvalid)
        fi = jax.vmap(lambda i, f: flatten_indices(i, f, V))
        out = jnp.stack([fi(im, fm), fi(i0, f0), fi(ip, fp)], axis=1)
        return out.reshape(kz * ky * 3, *out.shape[2:])  # [G*3, B, V]

    offsets = make_offsets(ks)
    center = np.array([k // 2 for k in ks], dtype=np.int32)
    deltas = jnp.asarray(np.array(offsets, np.int32) - center[None, :])

    def one(delta):
        q = s.coords + delta[None, None, :]
        idx, found = coord_ops.lookup_coords(
            table, q, s.spatial_shape, extra_valid=valid)
        return flatten_indices(idx, found, V)

    return jax.vmap(one)(deltas)  # [K, B, V]


def subm_conv(st: SparseTensor, weights, kernel_size=3, rulebook=None):
    """Submanifold sparse conv: output sites == input sites.

    weights: [K, Cin, Cout] with K = prod(kernel_size), taps in raster order.
    rulebook: a [K, B, V] gather rulebook (build_subm_rulebook).
    Returns features [B, V, Cout].

    On TPU this runs the fused Pallas gather->GEMM kernel (the backward's
    transposed rulebook is the mirror-tap rulebook, derived internally).
    """
    if rulebook is None:
        rulebook = build_subm_rulebook(st.structure, kernel_size)
    B, V, _ = st.features.shape
    mode = _pallas_mode()
    if mode and spk.supported(B * V, B * V, rulebook.shape[0]):
        return _fused_conv(st.features, weights, rulebook, None, mode)
    return gather_gemm(_flat_features(st.features), rulebook, weights)


def downsample_structure(st_struct: SparseStructure, stride, capacity,
                         kernel_size=3, padding=1, rule="decimation"):
    """Output sites for a strided conv.

    rule="decimation" (default): unique(floor(coords / stride))
    (Minkowski-style). Every input voxel contributes to some output; only
    outputs whose stride-block is empty (but whose kernel halo is not) are
    omitted, and the decoder's inverse convs restore the exact stored
    coordinate sets either way.

    rule="union": spconv SparseConv3d parity — every output position whose
    receptive field contains an active input, i.e. all o with
    o*stride + t - pad == i for some tap t (cf. spconv's
    get_indice_pairs). Produces a superset of decimation sites; used by
    parity runs (UNetSCN3D model_cfg OUTPUT_SITES="union").
    """
    sz3 = _triple(stride)
    in_shape = st_struct.spatial_shape
    out_shape = tuple(-(-d // s) for d, s in zip(in_shape, sz3))
    valid = st_struct.valid_mask()

    if rule == "union":
        ks3 = _triple(kernel_size)
        pd3 = _triple(padding)
        # per-dim candidate outputs: o in [ceil((i+p-k+1)/s), floor((i+p)/s)]
        ncand = [-(-k // s) for k, s in zip(ks3, sz3)]
        los, his, cands = [], [], []
        for d in range(3):
            i = st_struct.coords[..., d]
            k, s, p = ks3[d], sz3[d], pd3[d]
            lo = -(-(i + p - k + 1) // s)
            hi = (i + p) // s
            los.append(lo)
            his.append(hi)
        B, V, _ = st_struct.coords.shape
        coords_c, valid_c = [], []
        for jz in range(ncand[0]):
            for jy in range(ncand[1]):
                for jx in range(ncand[2]):
                    oz, oy, ox = los[0] + jz, los[1] + jy, los[2] + jx
                    ok = (valid & (oz <= his[0]) & (oy <= his[1])
                          & (ox <= his[2]) & (oz >= 0) & (oy >= 0)
                          & (ox >= 0) & (oz < out_shape[0])
                          & (oy < out_shape[1]) & (ox < out_shape[2]))
                    coords_c.append(jnp.stack([oz, oy, ox], axis=-1))
                    valid_c.append(ok)
        cand = jnp.concatenate(coords_c, axis=1)
        cval = jnp.concatenate(valid_c, axis=1)
        out_coords, out_num, _ = coord_ops.unique_coords(
            cand, cval, out_shape, capacity
        )
    else:
        stride_arr = jnp.asarray(sz3, dtype=jnp.int32)
        down = st_struct.coords // stride_arr[None, None, :]
        out_coords, out_num, _ = coord_ops.unique_coords(
            down, valid, out_shape, capacity
        )
    return SparseStructure(
        coords=out_coords,
        num_voxels=out_num,
        spatial_shape=out_shape,
    )


def build_strided_rulebook(
    s_in: SparseStructure,
    out_struct: SparseStructure,
    kernel_size=3,
    stride=2,
    padding=1,
    table=None,
):
    """Gather indices for a strided conv: input coord = o*stride + k - pad."""
    ks = _triple(kernel_size)
    sz = _triple(stride)
    pad = _triple(padding)
    if table is None:
        table = dense_table(s_in)
    stride_arr = jnp.asarray(sz, dtype=jnp.int32)
    ovalid = out_struct.valid_mask()
    base = out_struct.coords * stride_arr[None, None, :]
    Vin = s_in.capacity

    if (isinstance(table, (coord_ops.RankTable, coord_ops.KeyTable))
            and ks[2] == 3 and pad[2] <= 2):
        # x-taps query cells base_x+dx-px for dx in {0,1,2}: consecutive,
        # so one rank-table gather at the middle cell serves all three
        kz, ky, _ = ks
        d = np.array([(dz - pad[0], dy - pad[1])
                      for dz in range(kz) for dy in range(ky)], np.int32)
        dza = jnp.asarray(d[:, 0])[:, None, None]
        dya = jnp.asarray(d[:, 1])[:, None, None]
        qc = jnp.stack([
            base[None, ..., 0] + dza,
            base[None, ..., 1] + dya,
            base[None, ..., 2] + jnp.zeros_like(dza) + (1 - pad[2]),
        ], axis=-1)  # [G, B, V, 3]
        gvalid = jnp.broadcast_to(ovalid[None], qc.shape[:-1])
        (im, fm), (i0, f0), (ip, fp) = _lookup_rank3_groups(
            table, qc, gvalid)
        fi = jax.vmap(lambda i, f: flatten_indices(i, f, Vin))
        out = jnp.stack([fi(im, fm), fi(i0, f0), fi(ip, fp)], axis=1)
        return out.reshape(ks[0] * ks[1] * 3, *out.shape[2:])

    deltas = jnp.asarray(
        np.array(make_offsets(ks), np.int32) - np.array(pad, np.int32)[None, :]
    )

    def one(delta):
        # invalid output rows have coords=-1 -> q may still be in-bounds;
        # mask them explicitly
        q = base + delta[None, None, :]
        idx, found = coord_ops.lookup_coords(
            table, q, s_in.spatial_shape, extra_valid=ovalid)
        return flatten_indices(idx, found, Vin)

    return jax.vmap(one)(deltas)


def strided_conv(
    st: SparseTensor,
    out_struct: SparseStructure,
    weights,
    kernel_size=3,
    stride=2,
    padding=1,
    rulebook=None,
    rulebook_t=None,
):
    """Strided sparse conv onto a precomputed output structure.

    rulebook_t: the paired INVERSE rulebook (build_inverse_rulebook with the
    same kernel/stride/padding) — it is the exact transpose of ``rulebook``
    at every tap, and enables the fused Pallas kernel's backward pass.
    Without it the XLA gather path is used.
    """
    if rulebook is None:
        rulebook = build_strided_rulebook(
            st.structure, out_struct, kernel_size, stride, padding
        )
    B, V, _ = st.features.shape
    mode = _pallas_mode()
    if (mode and rulebook_t is not None
            and spk.supported(B * V, B * out_struct.capacity,
                              rulebook.shape[0])):
        return _fused_conv(st.features, weights, rulebook, rulebook_t, mode)
    return gather_gemm(_flat_features(st.features), rulebook, weights)


def build_inverse_rulebook(
    s_low: SparseStructure,
    target_struct: SparseStructure,
    kernel_size=3,
    stride=2,
    padding=1,
    table=None,
):
    """Gather indices for the inverse conv: source d = (t + pad - k) / stride,
    valid iff the division is exact. Exact transpose of the strided gather
    pattern, i.e. spconv SparseInverseConv3d indice_key reuse."""
    ks = _triple(kernel_size)
    sz = np.array(_triple(stride), dtype=np.int32)
    pad = np.array(_triple(padding), dtype=np.int32)
    if table is None:
        table = dense_table(s_low)
    tvalid = target_struct.valid_mask()
    Vlo = s_low.capacity

    if (isinstance(table, (coord_ops.RankTable, coord_ops.KeyTable))
            and ks[2] == 3 and int(sz[2]) in (1, 2)):
        # x numerators n_dx = t + px - dx for dx in {0,1,2} are consecutive;
        # with sx=1 all three map to consecutive source cells, with sx=2 the
        # two same-parity numerators map to consecutive cells — either way
        # one rank-table gather at g=(n0-1)>>1 (sx=2) / n0-1 (sx=1) covers
        # the whole group.
        kz, ky, _ = ks
        sxi = int(sz[2])
        miss = jnp.int32(target_struct.batch_size * Vlo)
        d = np.array([(dz, dy) for dz in range(kz) for dy in range(ky)],
                     np.int32)
        dza = jnp.asarray(d[:, 0])[:, None, None]
        dya = jnp.asarray(d[:, 1])[:, None, None]
        num_z = target_struct.coords[None, ..., 0] + int(pad[0]) - dza
        num_y = target_struct.coords[None, ..., 1] + int(pad[1]) - dya
        ez = num_z % int(sz[0]) == 0
        ey = num_y % int(sz[1]) == 0
        zq = num_z // int(sz[0])
        yq = num_y // int(sz[1])
        n0 = target_struct.coords[None, ..., 2] + int(pad[2])  # [1, B, V]
        gvalid = tvalid[None] & ez & ey
        center = (n0 - 1) if sxi == 1 else ((n0 - 1) >> 1)
        qc = jnp.stack(
            [zq, yq, jnp.broadcast_to(center, zq.shape)], axis=-1)
        (im, fm), (i0, f0), (ip, fp) = _lookup_rank3_groups(
            table, qc, gvalid)
        fi = jax.vmap(lambda i, f: flatten_indices(i, f, Vlo))
        gm, g0, gp = fi(im, fm), fi(i0, f0), fi(ip, fp)
        if sxi == 1:
            # dx=0 -> cell n0 (=center+1), dx=1 -> n0-1, dx=2 -> n0-2
            out = jnp.stack([gp, g0, gm], axis=1)
        else:
            even = jnp.broadcast_to((n0 & 1) == 0, gp.shape)
            # even n0: dx=0 at cell n0/2 (=g+1), dx=2 at n0/2-1 (=g)
            # odd  n0: dx=1 at (n0-1)/2 (=g)
            t0 = jnp.where(even, gp, miss)
            t1 = jnp.where(even, miss, g0)
            t2 = jnp.where(even, g0, miss)
            out = jnp.stack([t0, t1, t2], axis=1)
        return out.reshape(kz * ky * 3, *out.shape[2:])

    deltas = jnp.asarray(
        pad[None, :] - np.array(make_offsets(ks), np.int32)
    )
    stride_arr = jnp.asarray(sz)

    def one(delta):
        num = target_struct.coords + delta[None, None, :]
        exact = jnp.all(num % stride_arr[None, None, :] == 0, axis=-1)
        q = num // stride_arr[None, None, :]
        idx, found = coord_ops.lookup_coords(
            table, q, s_low.spatial_shape, extra_valid=exact & tvalid
        )
        return flatten_indices(idx, found, s_low.capacity)

    return jax.vmap(one)(deltas)


def inverse_conv(
    st_low: SparseTensor,
    target_struct: SparseStructure,
    weights,
    kernel_size=3,
    stride=2,
    padding=1,
    rulebook=None,
    rulebook_t=None,
):
    """Inverse (transposed) sparse conv back onto a stored high-res structure.

    rulebook_t: the paired STRIDED rulebook (its transpose at every tap);
    enables the fused Pallas kernel (see strided_conv).
    """
    if rulebook is None:
        rulebook = build_inverse_rulebook(
            st_low.structure, target_struct, kernel_size, stride, padding
        )
    B, V, _ = st_low.features.shape
    mode = _pallas_mode()
    if (mode and rulebook_t is not None
            and spk.supported(B * V, B * target_struct.capacity,
                              rulebook.shape[0])):
        return _fused_conv(st_low.features, weights, rulebook, rulebook_t,
                           mode)
    return gather_gemm(_flat_features(st_low.features), rulebook, weights)


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
