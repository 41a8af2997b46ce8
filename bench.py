#!/usr/bin/env python
"""Benchmark: MSeg3D flagship (SemanticKITTI config: ImprovedMeanVFE +
UNetSCN3D r=2 + HRNet-w18 + fusion head, V=131k, one 384x1280 camera)
full-scan inference throughput on one chip, plus unpipelined p50 latency.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of >=10 full-scan
MSeg3D inferences/sec/chip (BASELINE.json / BASELINE.md).

Measurement method (see .claude/skills/verify/SKILL.md): the axon relay
adds ~25 ms per host<->device roundtrip and block_until_ready can return
early, so throughput amortizes REPS forwards inside one jit program via
lax.fori_loop and fetches a scalar once. p50 latency is measured separately
as dispatch->scalar-fetch per single forward, RPC floor subtracted.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

RPC_FLOOR_S = 0.0255


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import (
        _mseg3d_model_cfg, _synthetic_mseg3d_batch, PCR, VSZ,
    )
    from lidarseg3d_tpu.models import build_detector

    # realistic single-scan shapes (SemanticKITTI-like density at 0.2 m grid)
    V, N = 131072, 122880
    grid = np.round(
        (np.asarray(PCR[3:]) - np.asarray(PCR[:3])) / np.asarray(VSZ)
    ).astype(int)
    ishape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    model = build_detector(_mseg3d_model_cfg(ratio=2))
    batch = _synthetic_mseg3d_batch(1, V, N, seed=0)
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}

    @jax.jit
    def init(rng, arrs):
        e = dict(arrs)
        e["input_shape"] = ishape
        return model.init(rng, e, train=False)

    variables = init(jax.random.PRNGKey(0), ex)
    jax.block_until_ready(variables)

    REPS = 10

    def fwd_labels(variables, e):
        ret, bat = model.apply(variables, e, train=False)
        return model.predict(ret, bat)["pred_point_sem_labels"]

    def run(variables, ex, reps):
        # reps is a TRACED scalar: a literal trip count makes XLA fully
        # unroll the loop and compile REPS copies of the forward (measured
        # 1237 s cold vs ~210 s for one copy — BENCH_r02 vs r03)
        def body(i, carry):
            e = dict(ex)
            e["input_shape"] = ishape
            # perturb features so no iteration is dead code
            e["voxels"] = e["voxels"] + (i % 2).astype(e["voxels"].dtype) * 1e-6
            return carry + fwd_labels(variables, e).sum()

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

    f = jax.jit(run)
    t0 = time.time()
    v = int(f(variables, ex, jnp.int32(REPS)))  # compile + first run
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        v = int(f(variables, ex, jnp.int32(REPS)))
        times.append(time.time() - t0)
    per_scan = (min(times) - RPC_FLOOR_S) / REPS
    scans_per_sec = 1.0 / per_scan

    # unpipelined p50 latency: single forward, dispatch -> scalar fetch
    @jax.jit
    def one(variables, ex):
        e = dict(ex)
        e["input_shape"] = ishape
        return fwd_labels(variables, e).sum()

    int(one(variables, ex))  # compile
    lats = []
    for _ in range(7):
        t0 = time.time()
        int(one(variables, ex))
        lats.append(time.time() - t0 - RPC_FLOOR_S)
    p50_ms = float(np.percentile(lats, 50) * 1000)

    sys.stderr.write(
        f"compile {compile_s:.1f}s; per-scan {per_scan*1000:.1f} ms; "
        f"p50 latency {p50_ms:.1f} ms (checksum {v})\n"
    )
    print(json.dumps({
        "metric": "mseg3d_semkitti_fullscan_inference_throughput",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 10.0, 3),
        "p50_latency_ms": round(p50_ms, 1),
    }))


if __name__ == "__main__":
    main()
