#!/usr/bin/env python
"""Microbenchmark: MSeg3D flagship TRAIN step with full activation remat.

Reproduces the STATUS.md headline: B=4 full-scan flagship train step fits
in 16 GB HBM with all three remat knobs on (UNet ACT_REMAT + SFFM decoder
ACT_REMAT + HRNet with_cp) and costs ~1.10x the B=1 per-scan time.

Same timing discipline as mb_train_batch.py (amortized fori_loop over NB
distinct batches, one scalar fetch, RPC floor subtracted).

Run: PYTHONPATH=/root/repo python tools/bench/mb_train_remat.py [--B 4]
     [--reps 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

RPC_FLOOR_S = 0.0255
NB = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--V", type=int, default=131072)
    ap.add_argument("--N", type=int, default=122880)
    ap.add_argument("--no-remat", action="store_true",
                    help="disable remat (expect OOM at B=4)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from __graft_entry__ import (
        _grid_shape, _mseg3d_model_cfg, _synthetic_mseg3d_batch,
    )
    from lidarseg3d_tpu.apis.train import create_train_state, make_train_step
    from lidarseg3d_tpu.models import build_detector
    from lidarseg3d_tpu.solver.optim import build_one_cycle_optimizer

    cfg = _mseg3d_model_cfg()
    if not args.no_remat:
        cfg["backbone"]["model_cfg"]["ACT_REMAT"] = True
        cfg["point_head"]["model_cfg"]["ACT_REMAT"] = True
        cfg["img_backbone"]["with_cp"] = True
    model = build_detector(cfg)
    ishape = _grid_shape()
    tx = build_one_cycle_optimizer(
        dict(type="adam", amsgrad=False, wd=0.01, fixed_wd=True),
        dict(type="one_cycle", lr_max=0.0025, moms=[0.95, 0.85],
             div_factor=10.0, pct_start=0.4),
        total_steps=1000)
    step_fn = make_train_step(model, tx, ishape)

    exs = []
    for s in range(NB):
        b = _synthetic_mseg3d_batch(args.B, args.V, args.N, seed=s,
                                    with_labels=True)
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
    int(f(state, stacked, jnp.int32(args.reps)))
    compile_s = time.time() - t0
    times = []
    for _ in range(2):
        t0 = time.time()
        int(f(state, stacked, jnp.int32(args.reps)))
        times.append(time.time() - t0)
    step_s = (min(times) - RPC_FLOOR_S) / args.reps
    B = args.B
    print(f"MSeg3D flagship B={B} remat={not args.no_remat}: "
          f"step {step_s*1000:.0f} ms, per-scan {step_s/B*1000:.0f} ms "
          f"({B/step_s:.2f} scans/s; compile {compile_s:.0f}s); "
          f"8-chip DP projection {8*B/step_s:.1f} scans/s")


if __name__ == "__main__":
    main()
