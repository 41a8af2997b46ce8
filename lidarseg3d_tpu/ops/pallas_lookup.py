"""Pallas rank-table gather kernel: sorted cell queries at ~VPU rate.

The rulebook builders (ops/sparse.py) spend nearly all their time in ONE
XLA op: an element gather of ~9*V sorted cell ids from the packed rank
table (ops/coords.py RankTable). XLA lowers element gathers to ~7.2 ns per
query regardless of table size (measured, scratch/mb_rb.py /
scratch/mb_gather3.py — a row-gather+select reformulation is 2-3x SLOWER).
At flagship scale that is ~22 ms/scan of rank-table queries — the largest
remaining cost after the fused conv kernel (PALLAS_PLAN.md round-3 notes).

This kernel exploits what XLA cannot: the query stream is MONOTONE
NON-DECREASING (voxel rows are key-sorted, each (dz, dy) tap group adds a
constant cell offset). A tile of 128 consecutive queries therefore falls in
a handful of consecutive 1024-cell windows of the table. Per query row the
kernel walks its [wstart, wstart+wcnt) window range (per-row anchors are
scalar-prefetched), and resolves all 128 queries per window with

  1 dynamic sublane slice  (window = table[w*8 : w*8+8, :], 8x128 = 1024
                            cells; offsets are multiples of 8 by
                            construction — Mosaic's dynamic-sublane rule)
  1 lane-dim take_along_axis (all 8 sublane candidates per query at once)
  8 compare+selects          (pick each query's sublane)

~2 windows/row on realistic scans -> ~1-2 ns/query vs 7.2 ns XLA.

The table must be VMEM-resident for the fast path: callers fall back to
the XLA gather when prod(spatial_shape) * 4 B exceeds LOOKUP_VMEM_BUDGET
(real SemanticKITTI 0.1 m grids are 370 MB -> XLA path; the 0.2 m bench
grid and every downsampled stage fit). ``lookup_gather`` stays correct
for any table size via an HBM-resident windowed-DMA variant
(``_hbm_kernel``: per query row, DMA the row's MAXW-window span into a
VMEM scratch slot, all rows in flight together), but MEASURED on v5e it
only beats the XLA element gather when consecutive voxels are ~a window
apart or closer (22 MB table / 48-cell spacing: 13.9 vs 17.1 ms per
1.08M queries) and loses badly on real sparse fills (172 MB / 375-cell
spacing: 109 vs 18 ms — chunk DMAs serialize, fetched windows are ~all
waste). Production dispatch (ops/sparse.py) therefore gates on
``supported()`` and leaves big-grid builds on the XLA gather.

Reference equivalence: this replaces spconv's GPU hash-table rulebook
queries (cf. /root/reference/det3d/models/backbones/scn_unet.py:11-30);
the rank-table packing itself is ops/coords.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8  # sublanes per window slice; window = SUB * LANES = 1024 cells
WIN = SUB * LANES
TILE_Q = SUB * LANES  # queries per grid step

# Max packed-table bytes kept VMEM-resident (v5e VMEM ~16 MB/core; leave
# room for query/output tiles and double buffering).
LOOKUP_VMEM_BUDGET = 12 * 1024 * 1024


def supported(ncells):
    """True if the packed table of ``ncells`` int32 cells fits the kernel."""
    ncells_pad = -(-int(ncells) // WIN) * WIN
    return ncells_pad * 4 <= LOOKUP_VMEM_BUDGET


def _lookup_kernel(wstart_ref, wcnt_ref, q_ref, t_ref, out_ref):
    """One grid step: resolve a [SUB, LANES] tile of sorted queries."""
    i = pl.program_id(0)

    for r in range(SUB):
        qrow = q_ref[r : r + 1, :]  # [1, LANES] cell ids
        # meta is [SUB, nb]: SMEM pads the LAST dim to 128 lanes, so the
        # long (nb) axis must be last (1.12 MB > 1 MB SMEM otherwise)
        w0 = wstart_ref[r, i]
        cnt = wcnt_ref[r, i]

        def body(k, acc, qrow=qrow, w0=w0):
            w = w0 + k
            win = t_ref[pl.ds(w * SUB, SUB), :]  # [SUB, LANES]
            local = qrow - w * WIN  # [1, LANES]
            lane = local & (LANES - 1)
            sub = local >> 7
            g = jnp.take_along_axis(
                win, jnp.broadcast_to(lane, (SUB, LANES)), axis=1
            )  # g[s, l] = win[s, lane_l]
            res = acc
            for s in range(SUB):
                res = jnp.where(sub == s, g[s : s + 1, :], res)
            inwin = (local >= 0) & (local < WIN)
            return jnp.where(inwin, res, acc)

        acc = jax.lax.fori_loop(
            0, cnt, body, jnp.zeros((1, LANES), jnp.int32)
        )
        out_ref[r : r + 1, :] = acc


MAXW = 4  # windows DMA'd per chunk in the HBM variant (16 KB per row DMA)


def _hbm_kernel(wstart_ref, wcnt_ref, q_ref, t_ref, out_ref, scr_ref,
                sem_ref):
    """HBM-resident table: DMA each row's window span into VMEM scratch.

    t_ref lives in ANY (HBM): per grid step the kernel issues SUB
    fixed-size DMAs (MAXW windows each, all rows in flight together so
    their latencies overlap), then resolves each row from its scratch
    slot. Rows spanning more than MAXW windows (rare: spans are ~2 on
    key-sorted streams) re-fill their slot chunk by chunk.
    """
    i = pl.program_id(0)
    nwmax = t_ref.shape[0] // SUB  # total 1024-cell windows in the table

    def row_copy(r, base):
        return pltpu.make_async_copy(
            t_ref.at[pl.ds(base * SUB, MAXW * SUB), :],
            scr_ref.at[r], sem_ref.at[r])

    def base_of(w0):
        return jnp.minimum(w0, nwmax - MAXW)

    for r in range(SUB):
        row_copy(r, base_of(wstart_ref[r, i])).start()

    for r in range(SUB):
        w0 = wstart_ref[r, i]
        end = w0 + wcnt_ref[r, i]
        base0 = base_of(w0)
        row_copy(r, base0).wait()
        qrow = q_ref[r : r + 1, :]

        def win_body(k, acc, base, qrow=qrow, r=r):
            # window k resident at scratch sublanes (k-base)*SUB
            win = scr_ref[r, pl.ds((k - base) * SUB, SUB), :]
            local = qrow - k * WIN
            lane = local & (LANES - 1)
            sub = local >> 7
            g = jnp.take_along_axis(
                win, jnp.broadcast_to(lane, (SUB, LANES)), axis=1)
            res = acc
            for s in range(SUB):
                res = jnp.where(sub == s, g[s : s + 1, :], res)
            inwin = (local >= 0) & (local < WIN)
            return jnp.where(inwin, res, acc)

        acc = jnp.zeros((1, LANES), jnp.int32)
        end0 = jnp.minimum(end, base0 + MAXW)
        acc = jax.lax.fori_loop(
            w0, end0, lambda k, a: win_body(k, a, base0), acc)

        def more_chunks(carry):
            k, _ = carry
            return k < end

        def next_chunk(carry, r=r, qrow=qrow):
            k, acc = carry
            base = base_of(k)
            cp = row_copy(r, base)
            cp.start()
            cp.wait()
            e = jnp.minimum(end, base + MAXW)
            acc = jax.lax.fori_loop(
                k, e, lambda kk, a: win_body(kk, a, base), acc)
            return (e, acc)

        _, acc = jax.lax.while_loop(more_chunks, next_chunk, (end0, acc))
        out_ref[r : r + 1, :] = acc


def _lookup_gather_hbm(table, wstart, wcnt, qtiles, *, interpret=False):
    """table [R, LANES] int32 (R % (MAXW*SUB) padded by caller);
    wstart/wcnt [SUB, nb]; qtiles [nb*SUB, LANES]."""
    nb = wstart.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SUB, MAXW * SUB, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((SUB,)),
        ],
    )
    return pl.pallas_call(
        _hbm_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wstart, wcnt, qtiles, table)


def lookup_gather(packed, cells, *, interpret=False):
    """Gather ``packed[cells]`` for a monotone-friendly sorted query stream.

    packed: [NCE] int32 table (any positive values; rank-table packing).
    cells:  [Q] int32, Q % 1024 == 0, values in [0, NCE). Cost is
            proportional to per-128-query window spans, so callers must
            keep the stream monotone non-decreasing per 1024-query tile
            (see sparse.py rank3 builders: invalid queries are clamped to
            min(cell, max_valid_cell), padding tiles repeat values).
    Returns [Q] int32 == packed[cells] (exactly; misses don't exist —
    every cell id is a real table cell).
    """
    (nce,) = packed.shape
    (q,) = cells.shape
    assert q % TILE_Q == 0, q
    resident = supported(nce)
    # the HBM variant's fixed-size chunk DMAs may reach MAXW windows past
    # any wstart, so pad the table to a MAXW-window multiple
    pad_to = WIN if resident else MAXW * WIN
    nce_pad = -(-nce // pad_to) * pad_to
    if nce_pad != nce:
        packed = jnp.pad(packed, (0, nce_pad - nce))
    table = packed.reshape(nce_pad // LANES, LANES)
    nb = q // TILE_Q

    w = (cells >> 10).reshape(nb, SUB, LANES)
    wstart = w.min(axis=-1).astype(jnp.int32)  # [nb, SUB]
    wcnt = (w.max(axis=-1) - wstart + 1).astype(jnp.int32)
    wstart, wcnt = wstart.T, wcnt.T  # [SUB, nb]: long axis last for SMEM

    if not resident:
        out = _lookup_gather_hbm(
            table, wstart, wcnt, cells.reshape(nb * SUB, LANES),
            interpret=interpret)
        return out.reshape(q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table, resident
        ],
        out_specs=pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _lookup_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wstart, wcnt, cells.reshape(nb * SUB, LANES), table)
    return out.reshape(q)
