#!/usr/bin/env python
"""Microbenchmark: rulebook-build chain on real TPU (STATUS numbers).

Times, per grid (semkitti 0.2 m / semnusc 0.1 m) at full-scan capacity:
  a. rank-table PACK: ops/pallas_rank.pack_rank_table (one-pass Pallas
     kernel) vs the XLA scatter+blocked-cumsum formulation;
  b. stage-1 structure: table build + 3^3 SubM rulebook (the hot per-scan
     structure cost the forward pays before any conv).

Timing discipline as bench.py: K reps amortized in one jit fori_loop over
NB distinct coordinate sets (nothing loop-invariant), one scalar fetch,
25.5 ms RPC floor subtracted.

Run: PYTHONPATH=/root/repo python tools/bench/mb_books.py [--reps 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

RPC_FLOOR_S = 0.0255
NB = 2


def synth_struct(V, N, pcr, vsz, seed):
    from __graft_entry__ import _synthetic_batch

    b = _synthetic_batch(1, V, N, seed=seed, pcr=pcr, vsz=vsz)
    return b["coordinates"], b["num_voxels"]


def timed(f, args, reps):
    import jax

    del jax
    t0 = time.time()
    int(f(*args, reps))  # scalar fetch — block_until_ready returns EARLY
    compile_s = time.time() - t0  # on axon (see verify skill gotchas)
    ts = []
    for _ in range(3):
        t0 = time.time()
        int(f(*args, reps))
        ts.append(time.time() - t0)
    return (min(ts) - RPC_FLOOR_S) / int(reps) * 1000, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from lidarseg3d_tpu.ops import coords as coord_ops
    from lidarseg3d_tpu.ops import sparse

    grids = [
        ("semkitti 0.2m", (-25.6, -25.6, -4.0, 25.6, 25.6, 2.0),
         (0.2, 0.2, 0.3), 131072, 122880),
        ("semnusc 0.1m", (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
         (0.1, 0.1, 0.2), 120000, 100000),
    ]
    reps = jnp.int32(args.reps)
    for name, pcr, vsz, V, N in grids:
        grid = np.round((np.asarray(pcr[3:]) - np.asarray(pcr[:3]))
                        / np.asarray(vsz)).astype(int)
        shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
        sets = [synth_struct(V, N, pcr, vsz, s) for s in range(NB)]
        cs = jnp.stack([jnp.asarray(c) for c, _ in sets])
        ns = jnp.stack([jnp.asarray(n) for _, n in sets])
        ncells = int(np.prod(shape))
        nce = ncells + 2  # x-extended, as build_rank_table lays it out

        # --- a. rank-table pack: one-pass Pallas kernel vs XLA blocked
        # cumsum (both inside build_rank_table; use_pallas switches) ---
        for use_pallas, tag in ((True, "pallas one-pass"),
                                ("xla", "XLA scatter+cumsum")):
            @jax.jit
            def run_pack(cs, ns, reps, up=(use_pallas is True)):
                def body(i, acc):
                    t = coord_ops.build_rank_table(
                        cs[i % NB], ns[i % NB], shape, use_pallas=up)
                    return acc + t.packed.reshape(-1)[::65536].sum()

                return jax.lax.fori_loop(
                    0, reps, body, jnp.zeros((), jnp.int32))

            ms, cs_s = timed(run_pack, (cs, ns), reps)
            print(f"{name}: build_rank_table [{tag}] "
                  f"({nce*4/1e6:.0f} MB table): {ms:.1f} ms "
                  f"(compile {cs_s:.0f}s)")

        # --- b. stage-1 table + SubM 3^3 rulebook ---
        @jax.jit
        def run_book(cs, ns, reps):
            def body(i, acc):
                st = sparse.build_structure(cs[i % NB], ns[i % NB], shape)
                table = sparse.dense_table(st)
                rb = sparse.build_subm_rulebook(st, 3, table=table)
                return acc + rb[0].reshape(-1)[::4096].sum()

            return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

        ms, cs_s = timed(run_book, (cs, ns), reps)
        print(f"{name}: stage-1 table + SubM 3^3 rulebook: {ms:.1f} ms "
              f"(compile {cs_s:.0f}s)")


if __name__ == "__main__":
    main()
