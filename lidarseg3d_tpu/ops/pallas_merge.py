"""Pallas sorted-keys rank lookup: rulebook queries without a dense table.

The rank-table rulebook path (ops/coords.py RankTable + ops/pallas_lookup.py)
needs the packed per-cell table VMEM-resident to beat XLA's element gather;
real 0.1 m grids (nuScenes stage 1: 43 M cells / 172 MB, stage 2: 22 MB)
don't fit, so those stages fell back to the XLA gather (~7.2 ns/query) and
still paid the full dense-table BUILD (act scatter + pack kernel over 43 M
cells). Measured on the honest per-scan bench this made the rulebook chain
the largest stage of the semnusc flagship forward (48 ms of 179 ms,
tools/bench/mb_flagship_stages.py).

This kernel removes the dense table entirely. The only state is the sorted
voxel KEY array itself — V int32 (≤ 2 MB at any capacity in this framework,
VMEM-resident at every stage and grid) — plus a tiny coarse block-rank
array. For a query cell q it computes exactly what a RankTable gather
returns:

    v(q) = (rank(q) << 3) | act(q-1) << 2 | act(q) << 1 | act(q+1)

with rank(q) = #{keys <= q} (keys are distinct and sorted, so rank-1 is the
row index), via a per-1024-query-tile binary search over 1024-key chunks of
the key array:

  - XLA precomputes per 1024-query tile a chunk anchor from the coarse
    block ranks (coarse[b] = #{keys < b << shift}; queries are monotone
    per tile by construction — see sparse.py _gather_cells clamping — so
    each tile touches ~1-2 chunks);
  - the kernel binary-searches each chunk once per TILE for
    pos = #{chunk keys <= q+1} — 11 vectorized fetch rounds where all
    [8, 128] queries gather from the [8, 128] chunk at once (_fetch:
    8 broadcast+lane-gather+select rounds resolve the sublane axis) —
    then checks the top three positions for membership of q+1, q, q-1.
    Keys outside the scanned chunks are accounted by the anchor baseline
    (all < q-1) or provably > q+1.

Cost ~14 tile-wide fetch rounds per 1024 queries ≈ 3 ns/query independent
of grid size, vs 7.2 ns/query XLA element gather + the dense build.

Reference equivalence: replaces spconv's GPU hash-table rulebook queries
(cf. /root/reference/det3d/models/backbones/scn_unet.py:11-30) for grids
whose dense table exceeds VMEM.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8
WIN = SUB * LANES  # 1024 keys per chunk / queries per grid tile
TILE_Q = WIN

# sentinel below any real key (keys/cells are >= 0; q-1 >= -1)
_NEVER = np.int32(-16)


def _fetch(chunk, idx):
    """chunk [SUB, LANES]; idx [SUB, LANES] int32 in [0, WIN): flat chunk
    values chunk[idx >> 7, idx & 127] for EVERY element of the tile at
    once. tpu.dynamic_gather only crosses lanes within one vreg, so the
    sublane dimension is resolved by SUB broadcast+gather+select rounds —
    the whole [8, 128] tile shares each round (an earlier per-row variant
    wasted 7/8 of every vreg and ran ~13 ns/query; this form measures
    ~3 ns/query on the semnusc stage-1 stream)."""
    lane = idx & (LANES - 1)
    sub = idx >> 7
    res = jnp.zeros((SUB, LANES), jnp.int32)
    for s in range(SUB):
        row = jnp.broadcast_to(chunk[s : s + 1, :], (SUB, LANES))
        g = jnp.take_along_axis(row, lane, axis=1)
        res = jnp.where(sub == s, g, res)
    return res


def _merge_kernel(cstart_ref, ccnt_ref, q_ref, k_ref, out_ref):
    i = pl.program_id(0)
    c0 = cstart_ref[i]
    cnt = ccnt_ref[i]
    q = q_ref[...]  # [SUB, LANES]
    qp = q + 1

    def body(k, carry):
        rank, am, a0, ap = carry
        chunk = k_ref[pl.ds((c0 + k) * SUB, SUB), :]
        # pos = #{chunk keys <= q+1}; chunk is sorted (padding
        # INVALID_KEY sorts last and exceeds any q+1)
        pos = jnp.zeros((SUB, LANES), jnp.int32)
        step = WIN
        while step >= 1:  # 11 guarded steps so pos can reach WIN
            cand = pos + step
            val = _fetch(chunk, jnp.minimum(cand - 1, WIN - 1))
            pos = jnp.where((cand <= WIN) & (val <= qp), cand, pos)
            step //= 2

        i1 = pos - 1
        k1 = _fetch(chunk, jnp.maximum(i1, 0))
        k1 = jnp.where(i1 >= 0, k1, _NEVER)
        apc = (k1 == qp).astype(jnp.int32)
        i2 = pos - 1 - apc
        k2 = _fetch(chunk, jnp.maximum(i2, 0))
        k2 = jnp.where(i2 >= 0, k2, _NEVER)
        a0c = (k2 == q).astype(jnp.int32)
        i3 = i2 - a0c
        k3 = _fetch(chunk, jnp.maximum(i3, 0))
        k3 = jnp.where(i3 >= 0, k3, _NEVER)
        amc = (k3 == q - 1).astype(jnp.int32)
        return (rank + pos - apc, am | amc, a0 | a0c, ap | apc)

    init = (
        (c0 * WIN) * jnp.ones((SUB, LANES), jnp.int32),
        jnp.zeros((SUB, LANES), jnp.int32),
        jnp.zeros((SUB, LANES), jnp.int32),
        jnp.zeros((SUB, LANES), jnp.int32),
    )
    rank, am, a0, ap = jax.lax.fori_loop(0, cnt, body, init)
    out_ref[...] = (rank << 3) | (am << 2) | (a0 << 1) | ap


def merge_gather(keys, coarse, shift, cells, *, interpret=False):
    """Rank-table-equivalent packed values for sorted-stream cell queries.

    keys:   [Vp] int32 ascending distinct cell keys, INVALID_KEY padding,
            Vp % 1024 == 0 (callers pad; coords.build_key_table does).
    coarse: [NB + 1] int32, coarse[b] = #{valid keys < b << shift},
            coarse[NB] = total valid keys; NB >= (max_cell >> shift) + 2.
    cells:  [Q] int32 query cells, Q % 1024 == 0, monotone non-decreasing
            per 1024-query tile (see sparse.py _gather_cells).
    Returns [Q] int32 packed (rank << 3 | am << 2 | a0 << 1 | ap).
    """
    (vp,) = keys.shape
    (q,) = cells.shape
    assert vp % WIN == 0, vp
    assert q % TILE_Q == 0, q
    nb = q // TILE_Q
    nbk = coarse.shape[0] - 1

    qt = cells.reshape(nb, TILE_Q)
    qmin = qt.min(axis=-1)  # [nb]: anchors are per TILE (the kernel's
    qmax = qt.max(axis=-1)  # whole [8, 128] block walks one chunk span)
    blo = jnp.clip((qmin - 1) >> shift, 0, nbk)
    bhi = jnp.clip(((qmax + 1) >> shift) + 1, 0, nbk)
    p0 = jnp.take(coarse, blo, axis=0)
    p1 = jnp.take(coarse, bhi, axis=0)
    cstart = (p0 >> 10).astype(jnp.int32)  # [nb]
    ccnt = (((p1 + WIN - 1) >> 10) - cstart).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # keys, resident
        ],
        out_specs=pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _merge_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cstart, ccnt, cells.reshape(nb * SUB, LANES),
      keys.reshape(vp // LANES, LANES))
    return out.reshape(q)


def merge_gather_xla(keys, num_valid, cells):
    """Pure-XLA oracle/fallback with identical semantics to merge_gather.

    keys: [Vp] ascending distinct (INVALID_KEY padded); num_valid scalar;
    cells: [Q]. searchsorted costs ~log2(Vp) element gathers per query —
    used on non-TPU backends and as the test oracle.
    """
    pos = jnp.searchsorted(keys, cells, side="right")  # INVALID > any cell
    rank = jnp.minimum(pos, num_valid).astype(jnp.int32)

    def has(v):
        p = jnp.searchsorted(keys, v, side="left")
        return (jnp.take(keys, jnp.clip(p, 0, keys.shape[0] - 1)) == v) & (
            p < num_valid
        )

    am = has(cells - 1)
    a0 = has(cells)
    ap = has(cells + 1)
    return ((rank << 3) | (am.astype(jnp.int32) << 2)
            | (a0.astype(jnp.int32) << 1) | ap.astype(jnp.int32))
