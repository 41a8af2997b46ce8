"""Pallas rank-table PACK kernel: act bits -> packed prefix table, one pass.

build_rank_table (ops/coords.py) turns the active-cell bitmap into
  packed[c] = (rank(c) << 3) | act(c-1) << 2 | act(c) << 1 | act(c+1)
where rank is an inclusive prefix sum over the whole (x-extended) grid.
The XLA formulation (scatter + blocked cumsum + shifts + ors) makes ~6
passes over the table — measured 12.0 ms for the 172 MB nuScenes stage-1
table (scratch/mb_books.py), ~25x off streaming roofline.

This kernel does it in ONE pass: the grid walks 8192-cell blocks
sequentially; each step computes the in-block prefix sum in registers
(log-step lane shifts + a sublane prefix), adds the running carry kept in
SMEM scratch (sequential TPU grids persist scratch across steps), forms
the neighbor bits from one-linear-position shifts (block-boundary bits
ride the carry / a one-block-lookahead input ref), and writes the packed
block. Traffic = read NCE int8 + write 4*NCE bytes.

Reference equivalence: this is the build stage of the spconv rulebook
replacement (see coords.RankTable; cf.
/root/reference/det3d/models/backbones/scn_unet.py:11-30).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBS = 64  # sublanes per block
BLK = SUBS * LANES  # 8192 cells per grid step


def _pack_kernel(a_ref, nxt_ref, out_ref, carry_ref):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = 0  # running rank
        carry_ref[1] = 0  # last act bit of the previous block

    a = a_ref[...].astype(jnp.int32)  # [SUBS, LANES] 0/1

    # in-block inclusive prefix sum, row-major (cell = s*LANES + l):
    # 1) lane-dim log shifts
    x = a
    k = 1
    while k < LANES:
        x = x + jnp.concatenate(
            [jnp.zeros((SUBS, k), jnp.int32), x[:, :-k]], axis=1)
        k *= 2
    # 2) exclusive sublane prefix of the row totals
    tot = x[:, LANES - 1:LANES]  # [SUBS, 1]
    r = tot
    k = 1
    while k < SUBS:
        r = r + jnp.concatenate(
            [jnp.zeros((k, 1), jnp.int32), r[:-k]], axis=0)
        k *= 2
    row_excl = r - tot  # [SUBS, 1]
    rank = x + row_excl + carry_ref[0]

    # neighbor bits: one linear position left / right of each cell
    lastcol = a[:, LANES - 1:LANES]  # [SUBS, 1]
    prev_bits = jnp.concatenate(
        [jnp.full((1, 1), carry_ref[1], jnp.int32), lastcol[:-1]], axis=0)
    am = jnp.concatenate([prev_bits, a[:, :-1]], axis=1)

    firstcol = a[:, 0:1]
    next_first = jnp.where(i + 1 < nb, nxt_ref[0, 0].astype(jnp.int32), 0)
    next_bits = jnp.concatenate(
        [firstcol[1:], jnp.full((1, 1), next_first, jnp.int32)], axis=0)
    ap = jnp.concatenate([a[:, 1:], next_bits], axis=1)

    out_ref[...] = (rank << 3) | (am << 2) | (a << 1) | ap
    carry_ref[0] = rank[SUBS - 1, LANES - 1]
    carry_ref[1] = a[SUBS - 1, LANES - 1]


def pack_rank_table(act, *, interpret=False):
    """act: [NCE] int8/int32 0-1 bitmap -> packed [NCE] int32 rank table.

    NCE is padded to a BLK multiple internally; padding cells are inactive
    and their packed values are dropped.
    """
    (nce,) = act.shape
    nce_pad = -(-nce // BLK) * BLK
    if nce_pad != nce:
        act = jnp.pad(act, (0, nce_pad - nce))
    a2 = act.reshape(nce_pad // LANES, LANES)
    nb = nce_pad // BLK

    out = pl.pallas_call(
        _pack_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((SUBS, LANES), lambda i: (i, 0)),
            # one-block lookahead for the trailing act(c+1) bit
            pl.BlockSpec((SUBS, LANES),
                         lambda i: (jnp.minimum(i + 1, nb - 1), 0)),
        ],
        out_specs=pl.BlockSpec((SUBS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nce_pad // LANES, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(a2, a2)
    return out.reshape(nce_pad)[:nce]
