"""Fused Pallas sparse-conv integration: rulebook adapters + custom VJP.

Bridges the [K, B, V] global-flat rulebooks of ops/sparse.py onto the fused
gather->GEMM Pallas kernel (ops/pallas_conv.py) and supplies the training
backward pass. This is the TPU-native equivalent of spconv's fused rulebook
kernels used by the reference backbone
(/root/reference/det3d/models/backbones/scn_unet.py:11-30).

Backward structure (see pallas_conv.py docstring): per-tap rulebooks are
partial permutations, so dL/dx is itself a rulebook conv under the TRANSPOSED
rulebook:

- submanifold conv: the transposed rulebook of tap k is the rulebook of the
  mirror tap K-1-k on the same structure (``gidx_t=None``);
- strided <-> inverse conv: each is the other's transpose at the SAME tap,
  so callers pass the paired rulebook (``rulebook_t``) that the UNet already
  builds for the decoder (spconv indice_key reuse, scn_unet.py:90-160).

dL/dW re-gathers the im2col blocks (rulebook_conv_dw); only (x, w) are saved
as residuals, so the fused path needs no jax.checkpoint: activation memory
matches the rematerialized XLA path by construction.

VMEM budget: the feature table lives transposed [C, V] and fully VMEM-resident
in the kernel; convs whose table exceeds TABLE_BUDGET_BYTES are split along
Cin (the conv is linear in Cin, partial outputs are summed in fp32).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_conv as pc

LANES = pc.LANES
# table slab per kernel call; alongside im2col scratch + weights this fits
# the ~16 MB VMEM of a v5e core (measured good at 8.4 MB: C=32, V=131072 bf16)
TABLE_BUDGET_BYTES = 9 << 20
MAX_ROWS = pc._MAX_BLOCKS * LANES  # packed 14-bit window-start fields
# output blocks per kernel call: the prefetched per-block metadata (epack
# [nb, K] etc.) lives in the 1 MB SMEM — nb=2048 overflows it (measured at
# B=2), so larger outputs run as column-chunked calls over the same table
MAX_NB_PER_CALL = 1024


def _round_up(n, m):
    return -(-n // m) * m


def supported(n_in, n_out, n_taps):
    """Shape limits of the packed kernel metadata fields."""
    return (
        _round_up(n_in, LANES) <= MAX_ROWS
        and _round_up(n_out, LANES) <= MAX_ROWS
        and n_taps <= 32
    )


def kernel_rulebook(gidx, n_in):
    """[K, B, Vout] global-flat rulebook (miss = n_in) -> kernel format.

    Returns [K, BVout_pad] int32 with misses = pc.MISS and the output axis
    padded to a multiple of 128 lanes.
    """
    K, B, Vout = gidx.shape
    g = gidx.reshape(K, B * Vout)
    g = jnp.where(g == n_in, pc.MISS, g)
    pad = _round_up(B * Vout, LANES) - B * Vout
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad)), constant_values=int(pc.MISS))
    return g.astype(jnp.int32)


def _chunk_sizes(cin, np_rows, itemsize, pair):
    """Split Cin so each chunk's [cc, Np] table fits the VMEM budget.

    Chunk sizes are multiples of 8: the kernel's dynamic im2col sublane
    offsets are tap*Cin, which Mosaic must statically prove 8-aligned."""
    max_c = max(8, (TABLE_BUDGET_BYTES // (np_rows * itemsize)) // 8 * 8)
    nchunk = -(-cin // max_c)
    csize = _round_up(-(-cin // nchunk), 8)
    return [(c0, min(c0 + csize, cin)) for c0 in range(0, cin, csize)]


def _slice_meta(meta, b0, b1):
    return dict(
        gcode=meta["gcode"][:, b0:b1],
        epack=meta["epack"][b0:b1],
        ecnt=meta["ecnt"][b0:b1],
        nz=meta["nz"][b0:b1],
    )


def _call_conv(table_chunk, gidx_k, wmat, cout, meta, interpret):
    """rulebook_conv_block, column-chunked to respect the SMEM budget."""
    nb = gidx_k.shape[1] // LANES
    if nb <= MAX_NB_PER_CALL:
        return pc.rulebook_conv_block(
            table_chunk, gidx_k, wmat, cout=cout, meta=meta,
            interpret=interpret)
    outs = []
    for b0 in range(0, nb, MAX_NB_PER_CALL):
        b1 = min(b0 + MAX_NB_PER_CALL, nb)
        outs.append(pc.rulebook_conv_block(
            table_chunk, gidx_k[:, b0 * LANES: b1 * LANES], wmat, cout=cout,
            meta=_slice_meta(meta, b0, b1), interpret=interpret))
    return jnp.concatenate(outs, axis=1)


def _call_dw(table_chunk, gidx_k, gout, meta, interpret):
    """rulebook_conv_dw, column-chunked; partial dW sums are exact."""
    nb = gidx_k.shape[1] // LANES
    if nb <= MAX_NB_PER_CALL:
        return pc.rulebook_conv_dw(
            table_chunk, gidx_k, gout, meta=meta, interpret=interpret)
    acc = None
    for b0 in range(0, nb, MAX_NB_PER_CALL):
        b1 = min(b0 + MAX_NB_PER_CALL, nb)
        part = pc.rulebook_conv_dw(
            table_chunk, gidx_k[:, b0 * LANES: b1 * LANES],
            gout[b0 * LANES: b1 * LANES], meta=_slice_meta(meta, b0, b1),
            interpret=interpret)
        acc = part if acc is None else acc + part
    return acc


def _conv_many(table_rows, gidx_k, weights, dtype, interpret, meta=None):
    """Chunked fused conv: sum_k take(table, gidx[k]) @ weights[k].

    table_rows: [N, Cin] (row-major features); gidx_k: [K, Mpad] kernel-format
    rulebook into rows [0, N); weights: [K, Cin, Cout].
    Returns ([Mpad, Cout] fp32, meta) — meta is reusable for the dW kernel.
    """
    N, Cin = table_rows.shape
    K, _, Cout = weights.shape
    bf16 = dtype == jnp.bfloat16
    # Mosaic dynamic sublane offsets (tail worklist im2col slices at
    # row0 + tap*Cin) must be 8-aligned: pad Cin to a multiple of 8
    if Cin % 8:
        pad_c = 8 - Cin % 8
        table_rows = jnp.pad(table_rows, ((0, 0), (0, pad_c)))
        weights = jnp.pad(weights, ((0, 0), (0, pad_c), (0, 0)))
        Cin += pad_c
    Np = _round_up(N, LANES)
    table_t = jnp.pad(table_rows, ((0, Np - N), (0, 0))).T.astype(dtype)
    if meta is None:
        meta = pc.build_kernel_meta(gidx_k, Np)
    out = None
    for c0, c1 in _chunk_sizes(Cin, Np, jnp.dtype(dtype).itemsize, bf16):
        wmat = (
            jnp.transpose(weights[:, c0:c1, :], (2, 0, 1))
            .reshape(Cout, -1)
            .astype(dtype)
        )
        o = _call_conv(
            table_t[c0:c1], gidx_k, wmat, Cout, meta, interpret,
        ).astype(jnp.float32)
        out = o if out is None else out + o
    return out.T, meta  # [Mpad, Cout] fp32


def _dw_many(table_rows, gidx_k, gout_rows, dtype, interpret, meta, cin):
    """Chunked dW: [K, Cin, Cout] fp32. gout_rows: [Mpad, Cout]."""
    N, Cin = table_rows.shape
    K = gidx_k.shape[0]
    bf16 = dtype == jnp.bfloat16
    padded_c = False
    if Cin % 8:
        table_rows = jnp.pad(table_rows, ((0, 0), (0, 8 - Cin % 8)))
        Cin += 8 - Cin % 8
        padded_c = True
    Np = _round_up(N, LANES)
    table_t = jnp.pad(table_rows, ((0, Np - N), (0, 0))).T.astype(dtype)
    gout = gout_rows.astype(dtype)
    parts = []
    for c0, c1 in _chunk_sizes(Cin, Np, jnp.dtype(dtype).itemsize, bf16):
        dw = _call_dw(
            table_t[c0:c1], gidx_k, gout, meta, interpret
        )  # [K*(c1-c0), Cout] fp32
        parts.append(dw.reshape(K, c1 - c0, -1))
    dw = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    if padded_c:
        dw = dw[:, :cin, :]
    return dw


def _rebase_row(gidx_row, b, v_in, old_miss):
    """[K, 1, V] global-flat indices of batch row b -> row-local flat
    indices into [v_in] (miss -> v_in)."""
    g = gidx_row - b * v_in
    return jnp.where(gidx_row == old_miss, v_in, g)


def fused_conv(features, weights, gidx, gidx_t=None, *, mode="bf16",
               interpret=False):
    """Sparse rulebook conv on the fused Pallas kernel, with custom VJP.

    features: [B, Vin, Cin]; weights: [K, Cin, Cout];
    gidx: [K, B, Vout] global-flat rulebook (miss = B*Vin);
    gidx_t: the transposed rulebook [K, B, Vin] (miss = B*Vout), or None for
            submanifold convs (mirror-tap rule; requires Vout == Vin).
    mode: "bf16" (production: bf16 gathers/GEMMs, fp32 accumulation) or
          "fp32" (Precision.HIGHEST, used by oracle tests).
    Returns [B, Vout, Cout] in features.dtype.

    B > 1 runs one kernel call PER ROW: a batched [C, B*V] table overflows
    the VMEM budget (forcing Cin splits that stream the doubled table
    multiple times) and its per-block metadata overflows SMEM (forcing
    column chunks) — measured 28% slower per scan than row-at-a-time at
    B=2 (STATUS r2 gap 4). Per-row calls keep each row's table fully
    VMEM-resident; dW contributions sum across rows via autodiff.
    """
    B, Vin, Cin = features.shape
    if B > 1:
        Vout = gidx.shape[2]
        n_in, n_out = B * Vin, B * Vout
        rows = []
        for b in range(B):
            g_b = _rebase_row(gidx[:, b:b + 1], b, Vin, n_in)
            gt_b = (None if gidx_t is None
                    else _rebase_row(gidx_t[:, b:b + 1], b, Vout, n_out))
            rows.append(fused_conv(
                features[b:b + 1], weights, g_b, gt_b, mode=mode,
                interpret=interpret))
        return jnp.concatenate(rows, axis=0)
    K, _, Cout = weights.shape
    Vout = gidx.shape[2]
    n_in, n_out = B * Vin, B * Vout
    dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    subm = gidx_t is None
    if subm:
        assert Vin == Vout, "subm mirror-tap transpose needs Vin == Vout"

    g_f = kernel_rulebook(gidx, n_in)
    g_b = (jnp.flip(g_f, axis=0) if subm
           else kernel_rulebook(gidx_t, n_out))

    @jax.custom_vjp
    def conv(x, w, gf, gb):
        out, _ = _conv_many(x.reshape(n_in, Cin), gf, w, dtype, interpret)
        return out[:n_out].reshape(B, Vout, Cout).astype(x.dtype)

    def conv_fwd(x, w, gf, gb):
        out, meta = _conv_many(x.reshape(n_in, Cin), gf, w, dtype, interpret)
        return (
            out[:n_out].reshape(B, Vout, Cout).astype(x.dtype),
            (x, w, gf, gb, meta),
        )

    def conv_bwd(res, g):
        x, w, gf, gb, meta = res
        # dX: conv of the output cotangent under the transposed rulebook.
        # gb[t] is already the transpose of tap t (mirror tap for subm, the
        # paired rulebook otherwise), so the weight for backward tap t is
        # W[t]^T in BOTH cases — the flip lives in the rulebook alone.
        wb = jnp.transpose(w, (0, 2, 1))  # [K, Cout, Cin]
        g_rows = g.reshape(n_out, Cout)
        dx, _ = _conv_many(g_rows, gb, wb, dtype, interpret)
        dx = dx[:n_in].reshape(B, Vin, Cin).astype(x.dtype)
        # dW: re-gather the im2col blocks and contract with the cotangent.
        Mp = _round_up(n_out, LANES)
        g_pad = jnp.pad(g_rows, ((0, Mp - n_out), (0, 0)))
        dw = _dw_many(x.reshape(n_in, Cin), gf, g_pad, dtype, interpret,
                      meta, Cin)
        z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return dx, dw.astype(w.dtype), z(gf), z(gb)

    conv.defvjp(conv_fwd, conv_bwd)
    return conv(features, weights, g_f, g_b)
