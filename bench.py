#!/usr/bin/env python
"""Benchmark: MSeg3D flagship full-scan inference throughput on one chip.

Two configs are measured:
- semnusc 6-cam (nuScenes MSeg3D: 6x 640x960 cameras, V=120k, bf16 image
  branch — the documented inference recipe; parity-tested vs fp32 in
  tests/test_mseg3d.py) — printed first as an auxiliary JSON line;
- semkitti 1-cam (SemanticKITTI MSeg3D: 1x 384x1280 camera, V=131k, fp32)
  — the primary metric, printed LAST as the driver's ONE JSON line.

vs_baseline is measured against the north-star target of >=10 full-scan
MSeg3D inferences/sec/chip (BASELINE.json / BASELINE.md).

Measurement method (see .claude/skills/verify/SKILL.md): the axon relay
adds ~25 ms per host<->device roundtrip and block_until_ready can return
early, so throughput amortizes REPS forwards inside one jit program via
lax.fori_loop and fetches a scalar once. Honesty guards, both learned the
hard way:
- the loop trip count is passed as a TRACED scalar: a literal trip count
  makes XLA fully unroll the loop and compile REPS copies of the forward
  (1237 s cold vs ~210 s, BENCH_r02 vs r03);
- the loop body indexes a [3, ...] stack of DISTINCT synthetic scans with
  i % 3 (round 4): perturbing only the features keeps the voxel
  COORDINATES loop-invariant, and XLA's while-loop invariant code motion
  hoists the entire structure/rulebook build chain out of the measured
  loop — reading ~17 ms/scan (semkitti) / ~50 ms/scan (semnusc) too fast.
  Production streams a new coordinate set every scan, so the bench must
  too. (BENCH_r03 numbers had this flaw; r04 numbers are lower but real.)

p50 latency is measured separately as dispatch->scalar-fetch per single
forward, RPC floor subtracted. MFU = exact HLO flops (XLA cost analysis,
utils/flops.py) / time / v5e bf16 peak.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

RPC_FLOOR_S = 0.0255
REPS = 9  # multiple of 3: each of the 3 stacked scans runs equally often
NSCANS = 3

# Peak MXU throughput for MFU accounting (VERDICT r3 item 2). jax.devices()
# on this image reports "TPU v5 lite" (v5e): 197 TFLOP/s bf16 / 98.5 fp32
# (public spec, cloud.google.com/tpu/docs/v5e). MFU is reported against the
# bf16 peak — the chip's headline number and the scaling-book convention —
# so a pure-fp32 program tops out at 0.5 by construction.
PEAK_FLOPS = {"bf16": 197e12, "fp32": 98.5e12}


def forward_flops(model, variables, ex, ishape):
    """Exact HLO flops of ONE jitted forward (utils/flops.count_flops)."""
    from lidarseg3d_tpu.utils.flops import count_flops

    def fwd(variables, e):
        e = dict(e)
        e["input_shape"] = ishape
        ret, bat = model.apply(variables, e, train=False)
        return model.predict(ret, bat)["pred_point_sem_labels"]

    try:
        return count_flops(fwd, variables, ex)["flops"]
    except Exception as exn:  # cost analysis is advisory; never fail bench
        sys.stderr.write(f"flops analysis failed: {exn}\n")
        return -1.0


def bench_model(model, exs, ishape, measure_p50=True):
    """exs: list of NSCANS distinct example dicts (same shapes)."""
    import jax
    import jax.numpy as jnp

    stacked = jax.tree.map(lambda *a: jnp.stack(a), *exs)
    ex0 = exs[0]

    @jax.jit
    def init(rng, arrs):
        e = dict(arrs)
        e["input_shape"] = ishape
        return model.init(rng, e, train=False)

    variables = init(jax.random.PRNGKey(0), ex0)
    jax.block_until_ready(variables)

    def fwd_labels(variables, e):
        ret, bat = model.apply(variables, e, train=False)
        return model.predict(ret, bat)["pred_point_sem_labels"]

    def run(variables, stacked, reps):
        def body(i, carry):
            # a DIFFERENT scan (coords included) every iteration: nothing
            # in the forward is loop-invariant, so nothing can be hoisted
            e = jax.tree.map(lambda a: a[i % NSCANS], stacked)
            e["input_shape"] = ishape
            return carry + fwd_labels(variables, e).sum()

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

    f = jax.jit(run)
    t0 = time.time()
    v = int(f(variables, stacked, jnp.int32(REPS)))  # compile + first run
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        v = int(f(variables, stacked, jnp.int32(REPS)))
        times.append(time.time() - t0)
    per_scan = (min(times) - RPC_FLOOR_S) / REPS

    p50_ms = None
    if measure_p50:
        @jax.jit
        def one(variables, ex):
            e = dict(ex)
            e["input_shape"] = ishape
            return fwd_labels(variables, e).sum()

        int(one(variables, ex0))  # compile
        lats = []
        for _ in range(7):
            t0 = time.time()
            int(one(variables, ex0))
            lats.append(time.time() - t0 - RPC_FLOOR_S)
        p50_ms = float(np.percentile(lats, 50) * 1000)
    return compile_s, per_scan, p50_ms, v, variables


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import (
        _mseg3d_model_cfg, _synthetic_mseg3d_batch, PCR, VSZ,
    )
    from lidarseg3d_tpu.models import build_detector

    def to_dev(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()
                if k != "metadata"}

    grid = np.round(
        (np.asarray(PCR[3:]) - np.asarray(PCR[:3])) / np.asarray(VSZ)
    ).astype(int)
    ishape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    # --- auxiliary: semnusc MSeg3D, 6 cameras at 640x960 (configs/
    # semanticnusc/MSeg3D/semnusc_avgvfe_...e12.py: img_resized_shape
    # (960, 640), capacity V=120k/N=100k, 17 classes, 0.1 m grid), bf16
    # image branch (the documented TPU inference recipe) ---
    PCR6 = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    VSZ6 = (0.1, 0.1, 0.2)
    grid6 = np.round(
        (np.asarray(PCR6[3:]) - np.asarray(PCR6[:3])) / np.asarray(VSZ6)
    ).astype(int)
    ishape6 = (int(grid6[2]) + 1, int(grid6[1]), int(grid6[0]))
    # capacity matches the flagship config: nuScenes nsweeps=1 keyframes
    # are <= 34,688 points (32-beam), padded to 40960 (see the config's
    # capacity comment). Round-3 benches padded to 120k/100k — 3x the real
    # scan — and measured mostly padding.
    V6, N6 = 40960, 40960
    model6 = build_detector(
        _mseg3d_model_cfg(num_class=17, ratio=2, img_hw=(640, 960),
                          pcr=PCR6, vsz=VSZ6, img_bf16=True))
    exs6 = [to_dev(_synthetic_mseg3d_batch(
        1, V6, N6, img_hw=(640, 960), ncam=6, seed=s, pcr=PCR6, vsz=VSZ6))
        for s in range(NSCANS)]
    c6, s6, p50_6, v6, vars6 = bench_model(model6, exs6, ishape6)
    fl6 = forward_flops(model6, vars6, exs6[0], ishape6)
    mfu6 = fl6 / s6 / PEAK_FLOPS["bf16"] if fl6 > 0 else -1.0
    sys.stderr.write(
        f"semnusc 6cam bf16-img: compile {c6:.1f}s; per-scan "
        f"{s6*1000:.1f} ms; p50 {p50_6:.1f} ms (checksum {v6}); "
        f"{fl6/1e9:.1f} GFLOP/scan, MFU {mfu6:.3f}\n")
    print(json.dumps({
        "metric": "semnusc_mseg3d_6cam_fullscan_inference_throughput",
        "value": round(1.0 / s6, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(1.0 / s6 / 10.0, 3),
        "compile_s": round(c6, 1),
        "p50_latency_ms": round(p50_6, 1),
        "gflops_per_scan": round(fl6 / 1e9, 1),
        "mfu": round(mfu6, 4),
    }), flush=True)

    # --- primary: semkitti MSeg3D, 1 camera at 384x1280, fp32 ---
    V, N = 131072, 122880
    model = build_detector(_mseg3d_model_cfg(ratio=2))
    exs = [to_dev(_synthetic_mseg3d_batch(1, V, N, seed=s))
           for s in range(NSCANS)]
    compile_s, per_scan, p50_ms, v, variables = bench_model(
        model, exs, ishape)
    scans_per_sec = 1.0 / per_scan
    fl = forward_flops(model, variables, exs[0], ishape)
    mfu = fl / per_scan / PEAK_FLOPS["bf16"] if fl > 0 else -1.0

    sys.stderr.write(
        f"semkitti: compile {compile_s:.1f}s; per-scan "
        f"{per_scan*1000:.1f} ms; p50 latency {p50_ms:.1f} ms "
        f"(checksum {v}); {fl/1e9:.1f} GFLOP/scan, MFU {mfu:.3f}\n"
    )
    print(json.dumps({
        "metric": "mseg3d_semkitti_fullscan_inference_throughput",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 10.0, 3),
        "p50_latency_ms": round(p50_ms, 1),
        "compile_s": round(compile_s, 1),
        "gflops_per_scan": round(fl / 1e9, 1),
        "mfu": round(mfu, 4),
        "semnusc_6cam_scans_per_sec": round(1.0 / s6, 3),
        "semnusc_6cam_mfu": round(mfu6, 4),
    }))


if __name__ == "__main__":
    main()
