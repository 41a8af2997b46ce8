#!/usr/bin/env python
"""Benchmark: SegNet (SDSeg3D-scale, SCALING_RATIO=2) full-scan inference
throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of >=10 full-scan
inferences/sec/chip (BASELINE.json / BASELINE.md).

Measurement method (see .claude/skills/verify/SKILL.md): the axon relay
adds ~25 ms per host<->device roundtrip and block_until_ready can return
early, so we amortize REPS forwards inside one jit program via lax.fori_loop
and fetch a scalar once.
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

    from __graft_entry__ import _model_cfg, _synthetic_batch, PCR, VSZ
    from lidarseg3d_tpu.models import build_detector

    # realistic single-scan shapes (SemanticKITTI-like density at 0.2 m grid)
    V, N = 131072, 122880
    grid = np.round(
        (np.asarray(PCR[3:]) - np.asarray(PCR[:3])) / np.asarray(VSZ)
    ).astype(int)
    ishape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    model = build_detector(_model_cfg(ratio=2))
    batch = _synthetic_batch(1, V, N, seed=0)
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}
    exi = dict(ex)
    exi["input_shape"] = ishape
    variables = model.init(jax.random.PRNGKey(0), exi, train=False)

    REPS = 10

    def run(variables, ex):
        def body(i, carry):
            e = dict(ex)
            e["input_shape"] = ishape
            # perturb features so no iteration is dead code
            e["voxels"] = e["voxels"] + (i % 2).astype(e["voxels"].dtype) * 1e-6
            ret, bat = model.apply(variables, e, train=False)
            lbl = model.predict(ret, bat)["pred_point_sem_labels"]
            return carry + lbl.sum()

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.int32))

    f = jax.jit(run)
    t0 = time.time()
    v = int(f(variables, ex))  # compile + first run, full sync via value fetch
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        v = int(f(variables, ex))
        times.append(time.time() - t0)
    per_scan = (min(times) - RPC_FLOOR_S) / REPS
    scans_per_sec = 1.0 / per_scan

    sys.stderr.write(
        f"compile {compile_s:.1f}s; per-scan {per_scan*1000:.1f} ms "
        f"(checksum {v})\n"
    )
    print(json.dumps({
        "metric": "segnet_sdseg3d_fullscan_inference_throughput",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
