#!/usr/bin/env python
"""Conv formulation shootout for the HRNet-w18 branch convs on TPU.

The w18 image branch runs 3x3 convs with C=18..144. The MXU is a 128x128
systolic array, so a conv at C_in=C_out=18 uses (18/128)^2 ~ 2% of it per
tap GEMM — mb_hrnet_stages measured stage3/4 at 2.3-3.6 TFLOP/s (~1-2% of
bf16 peak). Candidate fix: space-to-depth by 2 (s2d), an EXACT rewrite of
a stride-1 3x3 conv [N,H,W,C]->C as a 3x3 conv [N,H/2,W/2,4C]->4C with
rearranged (structurally 25%-dense) weights: 4x the MACs at ~16x the MXU
utilization for C=18.

This bench times the raw conv shapes (amortized fori_loop, traced trip
count, RPC floor subtracted — bench.py discipline) so the model-level
decision is grounded:
  b0      [6,160,240, 18]-> 18   branch0 block conv (w18 @ 6x640x960)
  b0_s2d  [6, 80,120, 72]-> 72   its s2d-by-2 equivalent (4x MACs)
  b0_s2d4 [6, 40, 60,288]->288   s2d-by-4 (16x MACs)
  b1      [6, 80,120, 36]-> 36   branch1 block conv
  b1_s2d  [6, 40, 60,144]->144
  b2      [6, 40, 60, 72]-> 72   branch2 block conv
  b3      [6, 20, 30,144]->144   branch3 block conv
  head1   [6,160,240,270]-> 48   FCN head conv1 (resize-concat input)
  headc   [6,160,240,318]-> 48   FCN head concat_input conv

Run: PYTHONPATH=/root/repo python tools/bench/mb_conv_variants.py [--reps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

RPC_FLOOR_S = 0.0255

SHAPES = [
    ("b0", (6, 160, 240, 18), 18),
    ("b0_s2d", (6, 80, 120, 72), 72),
    ("b0_s2d4", (6, 40, 60, 288), 288),
    ("b1", (6, 80, 120, 36), 36),
    ("b1_s2d", (6, 40, 60, 144), 144),
    ("b2", (6, 40, 60, 72), 72),
    ("b3", (6, 20, 30, 144), 144),
    ("head1", (6, 160, 240, 270), 48),
    ("headc", (6, 160, 240, 318), 48),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dt = jnp.float32 if args.fp32 else jnp.bfloat16
    rng = np.random.default_rng(0)

    for name, ishape, cout in SHAPES:
        cin = ishape[-1]
        x = jnp.asarray(rng.normal(size=ishape).astype(np.float32), dt)
        w = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.05, dt)

        def run(x, w, reps):
            def body(i, acc):
                # perturb the small operand (weights), not the map: a big
                # elementwise perturb adds ~1.8 ms/iter (verify SKILL.md).
                # Consume the FULL output via sum (fusable into the conv
                # epilogue) — consuming a corner lets XLA shrink the conv.
                wi = w + acc.astype(w.dtype) * 0
                y = jax.lax.conv_general_dilated(
                    x, wi, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return acc * 0.5 + y.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        f = jax.jit(run)
        t0 = time.time()
        float(f(x, w, jnp.int32(args.reps)))
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(f(x, w, jnp.int32(args.reps)))
            ts.append(time.time() - t0)
        ms = (min(ts) - RPC_FLOOR_S) / args.reps * 1000
        n, h, wd = ishape[:3]
        gf = n * h * wd * 9 * cin * cout * 2 / 1e9
        print(f"{name:8s} {str(ishape):>20s} -> {cout:3d}: {ms:7.3f} ms  "
              f"{gf:6.2f} GF  {gf / ms:6.1f} TFLOP/s  (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
