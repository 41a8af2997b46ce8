#!/usr/bin/env python
"""Microbenchmark: SegNet full-scan TRAIN step vs batch size (STATUS table).

Reproduces the headline batching numbers (STATUS.md "Round-3 results"):
fused-backward SegNet train steps on full 131k-voxel scans at B=1/2, and
B=4 with activation remat (ACT_REMAT) — the configuration that OOMs
without it.

Method (see .claude/skills/verify/SKILL.md): axon host<->device fetches
cost ~25 ms and block_until_ready can lie, so K steps are amortized inside
ONE jit via lax.fori_loop; the loop alternates between NB distinct batches
(coords included) so the rulebook-build chain cannot be hoisted as
loop-invariant code. One scalar fetch; RPC floor subtracted.

Run: PYTHONPATH=/root/repo python tools/bench/mb_train_batch.py [--remat]
     [--bs 1 2] [--reps 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--remat", action="store_true",
                    help="enable backbone ACT_REMAT (unlocks B=4)")
    ap.add_argument("--V", type=int, default=131072)
    ap.add_argument("--N", type=int, default=122880)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from __graft_entry__ import _model_cfg, _synthetic_batch, _grid_shape
    from lidarseg3d_tpu.apis.train import create_train_state, make_train_step
    from lidarseg3d_tpu.models import build_detector
    from lidarseg3d_tpu.solver.optim import build_one_cycle_optimizer

    cfg = _model_cfg()
    if args.remat:
        cfg["backbone"]["model_cfg"]["ACT_REMAT"] = True
    model = build_detector(cfg)
    ishape = _grid_shape()
    tx = build_one_cycle_optimizer(
        dict(type="adam", amsgrad=False, wd=0.01, fixed_wd=True),
        dict(type="one_cycle", lr_max=0.0025, moms=[0.95, 0.85],
             div_factor=10.0, pct_start=0.4),
        total_steps=1000)
    step_fn = make_train_step(model, tx, ishape)

    for B in args.bs:
        exs = []
        for s in range(NB):
            b = _synthetic_batch(B, args.V, args.N, seed=s, with_labels=True)
            exs.append({k: jnp.asarray(v) for k, v in b.items()
                        if k != "metadata"})
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *exs)
        state = create_train_state(model, exs[0], jax.random.PRNGKey(0), tx)

        def run(state, stacked, reps):
            def body(i, st):
                batch = jax.tree.map(lambda a: a[i % NB], stacked)
                st, _ = step_fn(st, batch)
                return st

            return jax.lax.fori_loop(0, reps, body, state).step

        f = jax.jit(run)
        t0 = time.time()
        try:
            int(f(state, stacked, jnp.int32(args.reps)))
        except Exception as e:
            print(f"B={B}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            continue
        compile_s = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            int(f(state, stacked, jnp.int32(args.reps)))
            times.append(time.time() - t0)
        step_s = (min(times) - RPC_FLOOR_S) / args.reps
        print(f"B={B} remat={args.remat}: step {step_s*1000:.0f} ms, "
              f"per-scan {step_s/B*1000:.0f} ms "
              f"({B/step_s:.2f} scans/s; compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
