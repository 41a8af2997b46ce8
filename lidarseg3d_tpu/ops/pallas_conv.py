"""Fused gather->GEMM sparse-conv Pallas kernel (TPU).

This is the round-2 performance kernel replacing the XLA per-tap row-gather
path in ops/sparse.py for the hot sparse convolutions (the TPU-native
equivalent of spconv's fused rulebook kernels used by the reference backbone,
/root/reference/det3d/models/backbones/scn_unet.py:11-30).

Design (measured on v5e, see PALLAS_PLAN.md / scratch/mb_gather*.py):

- XLA's row gather costs ~2.2 ns/row (one 512 B HBM read per gathered row);
  a 27-tap sparse conv is 27 such gathers -> ~9.5 ms at stage-1 scale.
- Mosaic's in-register ``tpu.dynamic_gather`` along the LANE dimension runs
  at ~2.4 cycles/vreg-op - 14x cheaper per row - but only selects within a
  single 128-lane vreg window, and dynamic (scalar-driven) lane slices of the
  table cost ~60 ns each, so the kernel is organized to amortize them:

  1. The whole feature table sits TRANSPOSED [C, V] and resident in VMEM
     (bf16, up to ~8 MB). bf16 pairs are gathered as int32 via bitcast
     (Mosaic has no native 16-bit dynamic_gather).
  2. Grid over output blocks of 128 voxels. Rows are key-sorted
     (ops/coords.py), so per-tap partner indices of a block are
     near-monotonic and span 1-2 aligned 128-lane windows (97% of tap-blocks
     on realistic scans).
  3. Taps are processed in GROUPS of 3 (the x-taps of a (dz, dy) pair, whose
     partner rows are adjacent in a key-sorted table): one dynamic window
     pair per group feeds 3 gathers - 9 dynamic slices per block vs 27.
     Groups with no partners at all skip their gathers; the second window
     runs only when some tap in the group needs it (both flags packed into
     the prefetched anchor word).
  4. The rare tap-blocks whose partners span >2 windows are finished by a
     per-block worklist loop (packed (tap, start, count) entries prefetched
     to SMEM) that read-modify-writes the im2col scratch.
  5. Blocks with no partners at all (the padding tail; ~25% of blocks at
     typical fill) skip the gather+GEMM entirely.
  6. The 27 selected [C, 128] tiles form an im2col scratch [27*C, 128]; one
     MXU GEMM [Cout, 27*C] @ [27*C, 128] per block yields the output tile
     (fp32 accumulation). The GEMM is software-pipelined one grid step behind
     the gathers (double-buffered im2col) so MXU and VPU work overlap.

The backward pass reuses the same kernel: per-tap rulebooks are partial
permutations (each input row feeds at most one output row per tap), so
dL/dx is a rulebook conv under the TRANSPOSED rulebook - which is free:
  - subm conv: transposed rulebook of tap k == rulebook of mirror tap K-1-k;
  - strided conv <-> inverse conv: each is the other's transpose (same tap).
dL/dW re-gathers the im2col block and contracts it with the output-grad tile.

Numerics: bf16 tables with fp32 GEMM accumulation in production (note the
XLA path's fp32 einsums are bf16-demoted by the TPU MXU by default anyway);
the fp32 kernel path forces Precision.HIGHEST and is used by oracle tests.

Capacity limits: V <= 16384*128 (packed field widths) and table <= ~8 MB
VMEM residency. Callers fall back to the XLA path beyond.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MISS = np.int32(2**30)  # sentinel partner index: never lands in any window
_MAX_BLOCKS = 16384  # packed field widths (14-bit window starts)


def build_kernel_meta(gidx, vin, group=3):
    """Precompute per-block window metadata for the kernel (XLA-side).

    gidx: [K, Vout_pad] int32 partner indices (MISS for no partner).
    vin: input table width (rows), multiple of 128.
    group: taps sharing a window pair (3 = x-taps of a (dz,dy) group).

    Returns dict(
      gcode [G, nb]: packed group anchor: -1 if the group has no partners,
                     else w0 | (need_second_window << 14);
      epack [nb, K]: packed tail entries tap<<27 | start<<13 | count,
                     real entries first;
      ecnt  [nb]:    number of tail entries;
      nz    [nb]:    1 if the block has any partner at all).
    """
    K, Vout = gidx.shape
    nb = Vout // LANES
    nb_in = vin // LANES
    assert nb_in <= _MAX_BLOCKS and nb <= _MAX_BLOCKS
    if K % group != 0:
        group = 1
    G = K // group

    g = gidx.reshape(K, nb, LANES)
    found = g != MISS
    big = jnp.int32(2**30)
    lo = jnp.min(jnp.where(found, g, big), axis=-1)  # [K, nb]
    hi = jnp.max(jnp.where(found, g, -1), axis=-1)
    anyf = jnp.any(found, axis=-1)
    w0 = jnp.where(anyf, lo // LANES, big)
    wend = jnp.where(anyf, hi // LANES + 1, 0)  # exclusive

    w0g = jnp.min(w0.reshape(G, group, nb), axis=1)
    w0g = jnp.clip(w0g, 0, max(nb_in - 2, 0)).astype(jnp.int32)
    gempty = jnp.all(~anyf.reshape(G, group, nb), axis=1)
    need2 = jnp.any(
        (wend.reshape(G, group, nb) > w0g[:, None, :] + 1), axis=1)
    gcode = jnp.where(gempty, -1,
                      w0g | (need2.astype(jnp.int32) << 14)).astype(jnp.int32)

    cov_end = jnp.repeat(w0g + 2, group, axis=0)  # [K, nb]
    start = jnp.maximum(jnp.where(anyf, w0, 0), cov_end)
    cnt = jnp.clip(wend - start, 0, None)
    has = cnt > 0
    order = jnp.argsort(~has, axis=0, stable=True).astype(jnp.int32)
    start_s = jnp.take_along_axis(start, order, axis=0)
    cnt_s = jnp.take_along_axis(cnt, order, axis=0)
    epack = (order << 27) | (start_s.astype(jnp.int32) << 13) | cnt_s.astype(
        jnp.int32)
    return dict(
        gcode=gcode,
        epack=jnp.transpose(epack).astype(jnp.int32),  # [nb, K]
        ecnt=jnp.sum(has, axis=0).astype(jnp.int32),
        nz=jnp.any(anyf, axis=0).astype(jnp.int32),
    )


def _load_band(table_ref, base, bf16):
    """Slice the 128-lane table window at ``base`` (int32-bitcast for bf16).

    Hoisted out of _gather_window so the 3 taps of a (dz, dy) group share
    ONE dynamic lane slice per window (dynamic slices cost ~60 ns each)."""
    band = table_ref[:, pl.ds(pl.multiple_of(base, LANES), LANES)]
    return pltpu.bitcast(band, jnp.int32) if bf16 else band


def _gather_band(band, idxb, base, g):
    """Merge rows idxb found in the preloaded window ``band`` at ``base``."""
    local = idxb - base
    valid = (local & ~(LANES - 1)) == 0  # 0 <= local < LANES
    got = jnp.take_along_axis(band, local & (LANES - 1), axis=1)
    return jnp.where(valid, got, g)


def _gather_window(table_ref, idxb, base, g, bf16):
    """Merge rows idxb found in the 128-lane table window at ``base``."""
    return _gather_band(_load_band(table_ref, base, bf16), idxb, base, g)


def _gather_phase(i, gcode_ref, epack_ref, ecnt_ref, gidx_ref, table_ref,
                  im2col_ref, *, K, Cin, group, bf16, slot=0):
    """Fill the im2col scratch (rows slot*K*Cin...) for output block ``i``."""
    half = Cin // 2 if bf16 else Cin
    G = K // group
    row0 = slot * K * Cin

    def read_idx(k):
        idx = gidx_ref[k, :]
        return jnp.broadcast_to(idx[None, :], (half, LANES))

    # Straight-line group bodies: no per-group emptiness/need-2nd-window
    # branching. At C<=32 the branchy form was SCALAR-bound (~1.8 us per
    # 128-output block with C16 == C32 — tools/bench/mb_conv_variants.py
    # notes in STATUS.md); realistic scans almost never take the skip arms
    # (groups are rarely empty, partners almost always straddle two
    # windows), so the branches were pure overhead. Empty groups (code<0)
    # degrade gracefully: w0 clamps to 0 and every gather lands
    # out-of-window -> zeros, exactly what the zero-fill arm produced.
    # Doing both windows unconditionally also keeps the tap's accumulator
    # in registers (the old 2nd-window pass read-modify-wrote im2col).
    for gi in range(G):
        code = gcode_ref[gi, i]
        w0 = jnp.maximum(code, 0) & (_MAX_BLOCKS - 1)
        band1 = _load_band(table_ref, w0 * LANES, bf16)
        band2 = _load_band(table_ref, (w0 + 1) * LANES, bf16)
        for t in range(group):
            k = gi * group + t
            idxb = read_idx(k)
            if bf16:
                acc = jnp.zeros((half, LANES), jnp.int32)
            else:
                acc = jnp.zeros((half, LANES), table_ref.dtype)
            acc = _gather_band(band1, idxb, w0 * LANES, acc)
            acc = _gather_band(band2, idxb, (w0 + 1) * LANES, acc)
            if bf16:
                acc = pltpu.bitcast(acc, jnp.bfloat16)
            im2col_ref[row0 + k * Cin:row0 + (k + 1) * Cin, :] = acc

    # tail: tap-blocks whose partners span beyond the 2 group windows
    def tail_entry(j, _):
        e = epack_ref[i, j]
        tap = (e >> 27) & 31
        start = (e >> 13) & (_MAX_BLOCKS - 1)
        cnt = e & 8191
        idx = gidx_ref[pl.ds(tap, 1), :]  # dynamic sublane row
        idxb = jnp.broadcast_to(idx.reshape(1, LANES), (half, LANES))
        cur = im2col_ref[pl.ds(row0 + tap * Cin, Cin), :]
        if bf16:
            cur = pltpu.bitcast(cur, jnp.int32)

        def win(c, g):
            return _gather_window(table_ref, idxb, (start + c) * LANES, g,
                                  bf16)

        g = jax.lax.fori_loop(0, cnt, win, cur)
        if bf16:
            g = pltpu.bitcast(g, jnp.bfloat16)
        im2col_ref[pl.ds(row0 + tap * Cin, Cin), :] = g
        return 0

    ec = ecnt_ref[i]

    @pl.when(ec > 0)
    def _():
        jax.lax.fori_loop(0, ec, tail_entry, 0)


def _conv_kernel(gcode_ref, epack_ref, ecnt_ref, nz_ref, gidx_ref, table_ref,
                 wmat_ref, out_ref, im2col_ref, *, K, Cin, Cout, group, bf16,
                 nb):
    """Software-pipelined: step i gathers block i, GEMMs block i-1."""
    i = pl.program_id(0)
    kc = K * Cin
    do_gather = jnp.logical_and(i < nb, nz_ref[jnp.minimum(i, nb - 1)] > 0)

    for s in (0, 1):
        @pl.when(jnp.logical_and(do_gather, i % 2 == s))
        def _(s=s):
            _gather_phase(i, gcode_ref, epack_ref, ecnt_ref, gidx_ref,
                          table_ref, im2col_ref, K=K, Cin=Cin, group=group,
                          bf16=bf16, slot=s)

    @pl.when(i > 0)
    def _():
        j = i - 1

        for s in (0, 1):
            @pl.when(jnp.logical_and(nz_ref[j] > 0, j % 2 == s))
            def _(s=s):
                acc = jax.lax.dot_general(
                    wmat_ref[:], im2col_ref[s * kc:(s + 1) * kc, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(None if bf16 else jax.lax.Precision.HIGHEST),
                )
                out_ref[:] = acc.astype(out_ref.dtype)

        @pl.when(nz_ref[j] == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)


def _dw_kernel(gcode_ref, epack_ref, ecnt_ref, nz_ref, gidx_ref, table_ref,
               gout_ref, dw_ref, im2col_ref, acc_ref, *, K, Cin, Cout, group,
               bf16, nb):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(nz_ref[i] > 0)
    def _():
        _gather_phase(i, gcode_ref, epack_ref, ecnt_ref, gidx_ref, table_ref,
                      im2col_ref, K=K, Cin=Cin, group=group, bf16=bf16)
        # [K*Cin, LANES] x [LANES, Cout] -> [K*Cin, Cout]
        part = jax.lax.dot_general(
            im2col_ref[:], gout_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(None if bf16 else jax.lax.Precision.HIGHEST),
        )
        acc_ref[:] += part

    @pl.when(i == nb - 1)
    def _():
        dw_ref[:] = acc_ref[:]


def rulebook_conv_block(table_t, gidx, wmat, *, cout, group=3, meta=None,
                        interpret=False):
    """Forward rulebook conv on a transposed feature table.

    table_t: [Cin, Vin_pad] (Vin_pad % 128 == 0), bf16 or fp32.
    gidx:    [K, Vout_pad] int32 partner indices, MISS = no partner.
    wmat:    [Cout, K*Cin] in table dtype (wmat[co, k*Cin+ci] = W[k, ci, co]).
    meta:    optional precomputed build_kernel_meta(gidx, Vin) (shared across
             convs on the same rulebook, i.e. spconv indice_key semantics).
    Returns [Cout, Vout_pad] in table dtype.
    """
    Cin, Vin = table_t.shape
    K, Vout = gidx.shape
    assert Vin % LANES == 0 and Vout % LANES == 0
    nb = Vout // LANES
    bf16 = table_t.dtype == jnp.bfloat16
    assert not bf16 or Cin % 2 == 0
    if K % group != 0:
        group = 1
    if meta is None:
        meta = build_kernel_meta(gidx, Vin, group=group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb + 1,),  # one extra step: the GEMM lags the gathers by one
        in_specs=[
            pl.BlockSpec((K, LANES), lambda i, *_: (0, jnp.minimum(i, nb - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, resident
        ],
        out_specs=pl.BlockSpec(
            (cout, LANES), lambda i, *_: (0, jnp.maximum(i - 1, 0)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * K * Cin, LANES), table_t.dtype)],
    )
    kern = functools.partial(_conv_kernel, K=K, Cin=Cin, Cout=cout,
                             group=group, bf16=bf16, nb=nb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((cout, Vout), table_t.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta["gcode"], meta["epack"], meta["ecnt"], meta["nz"], gidx, table_t,
      wmat)


def rulebook_conv_dw(table_t, gidx, gout, *, group=3, meta=None,
                     interpret=False):
    """dW for the rulebook conv: [K*Cin, Cout] fp32.

    gout: [Vout_pad, Cout] output cotangent in table dtype (row-major; the
    standard [m, co] contraction layout keeps the MXU on the native fp32
    path - a lanes x lanes contraction silently demotes fp32 to bf16).
    """
    Cin, Vin = table_t.shape
    K, Vout = gidx.shape
    Cout = gout.shape[1]
    nb = Vout // LANES
    bf16 = table_t.dtype == jnp.bfloat16
    if K % group != 0:
        group = 1
    if meta is None:
        meta = build_kernel_meta(gidx, Vin, group=group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((K, LANES), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table
            pl.BlockSpec((LANES, Cout), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # grad tile
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K * Cin, LANES), table_t.dtype),
            pltpu.VMEM((K * Cin, Cout), jnp.float32),
        ],
    )
    kern = functools.partial(_dw_kernel, K=K, Cin=Cin, Cout=Cout, group=group,
                             bf16=bf16, nb=nb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K * Cin, Cout), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta["gcode"], meta["epack"], meta["ecnt"], meta["nz"], gidx, table_t,
      gout)
