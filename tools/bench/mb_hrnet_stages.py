#!/usr/bin/env python
"""Per-stage attribution INSIDE the HRNet-w18 image backbone on TPU.

mb_img_stages.py splits the camera branch into backbone vs FCN head; this
drills into the backbone: stem, stage1 (Bottleneck C64/256), stage2/3/4
(HRModuleStack), each timed as a STANDALONE amortized jit program on
synthetic inputs with the shipping semnusc shapes (6 cams, 640x960, bf16).
Parameters are freshly initialized per program — timing only depends on
shapes. Also reports exact HLO GFLOPs per stage (XLA cost analysis) and
the implied TFLOP/s, so the stage with the worst MXU utilization is
obvious.

Run: PYTHONPATH=/root/repo python tools/bench/mb_hrnet_stages.py
     [--reps 8] [--fp32] [--ncam 6] [--hw 640 960]
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
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--ncam", type=int, default=6)
    ap.add_argument("--hw", type=int, nargs=2, default=[640, 960])
    ap.add_argument("--probes", default="stages",
                    choices=["stages", "branches", "all"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flax import linen as nn
    from lidarseg3d_tpu.models.img_backbones.hrnet import (
        Bottleneck, ConvBNReLU, HRModuleStack,
    )
    from lidarseg3d_tpu.utils.flops import count_flops

    dt = jnp.float32 if args.fp32 else jnp.bfloat16
    H, W = args.hw
    B = args.ncam
    rng = np.random.default_rng(0)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBNReLU(64, stride=2)(x, train)
            return ConvBNReLU(64, stride=2)(x, train)

    class Stage1(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for _ in range(4):
                x = Bottleneck(64)(x, train)
            return x

    class Blocks1(nn.Module):
        """4 BasicBlocks at C=18 full res: the small-lane worst case."""

        @nn.compact
        def __call__(self, x, train=False):
            from lidarseg3d_tpu.models.img_backbones.hrnet import BasicBlock
            for _ in range(4):
                x = BasicBlock(18)(x, train)
            return x

    def blocks_at(c, s2d=False):
        class BlocksC(nn.Module):
            """4 BasicBlocks at one branch width (per-module branch cost)."""

            @nn.compact
            def __call__(self, x, train=False):
                from lidarseg3d_tpu.models.img_backbones.hrnet import (
                    BasicBlock, space_to_depth, depth_to_space,
                )
                if s2d:
                    x = space_to_depth(x)
                for _ in range(4):
                    x = BasicBlock(c, s2d=s2d)(x, train)
                if s2d:
                    x = depth_to_space(x)
                return x

        return BlocksC()

    h4, w4 = H // 4, W // 4
    shapes2 = [(B, h4, w4, 18), (B, h4 // 2, w4 // 2, 36)]
    shapes3 = shapes2 + [(B, h4 // 4, w4 // 4, 72)]
    shapes4 = shapes3 + [(B, h4 // 8, w4 // 8, 144)]

    def mk(shape):
        return [jnp.asarray(rng.normal(size=shape), dt) for _ in range(NB)]

    stages = [
        ("stem", Stem(), [mk((B, H, W, 3))]),
        ("stage1", Stage1(), [mk((B, h4, w4, 64))]),
        ("blocks1x4", Blocks1(), [mk((B, h4, w4, 18))]),
        ("stage2", HRModuleStack(1, 2, (4, 4), (18, 36)),
         [mk(s) for s in shapes2]),
        ("stage3", HRModuleStack(4, 3, (4, 4, 4), (18, 36, 72)),
         [mk(s) for s in shapes3]),
        ("stage4", HRModuleStack(3, 4, (4, 4, 4, 4), (18, 36, 72, 144)),
         [mk(s) for s in shapes4]),
    ]
    # finer probes (--probes branches): per-branch-width block cost, the
    # shipping s2d variants, and a single stage-3 module (fuse cost =
    # module - sum of its branch blocks)
    extra = [
        ("br18x4", blocks_at(18), [mk((B, h4, w4, 18))]),
        ("br18x4_s2d", blocks_at(18, s2d=True), [mk((B, h4, w4, 18))]),
        ("br36x4", blocks_at(36), [mk((B, h4 // 2, w4 // 2, 36))]),
        ("br72x4", blocks_at(72), [mk((B, h4 // 4, w4 // 4, 72))]),
        ("br144x4", blocks_at(144), [mk((B, h4 // 8, w4 // 8, 144))]),
        ("stage3x1", HRModuleStack(1, 3, (4, 4, 4), (18, 36, 72)),
         [mk(s) for s in shapes3]),
        ("stage3x1_s2d",
         HRModuleStack(1, 3, (4, 4, 4), (18, 36, 72), s2d_max_c=18),
         [mk(s) for s in shapes3]),
        ("stage3_s2d",
         HRModuleStack(4, 3, (4, 4, 4), (18, 36, 72), s2d_max_c=18),
         [mk(s) for s in shapes3]),
        ("stage4_s2d",
         HRModuleStack(3, 4, (4, 4, 4, 4), (18, 36, 72, 144), s2d_max_c=18),
         [mk(s) for s in shapes4]),
    ]

    def timed(mod, inputs_nb):
        # inputs_nb: list over operands, each a list of NB variants
        stacked = [jnp.stack(v) for v in inputs_nb]
        x0 = [v[0] for v in stacked]
        arg0 = x0[0] if len(x0) == 1 else list(x0)
        variables = mod.init(jax.random.PRNGKey(0), arg0, train=False)
        jax.block_until_ready(variables)

        def apply(v, xs):
            arg = xs[0] if len(xs) == 1 else list(xs)
            out = mod.apply(v, arg, train=False)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in leaves)

        fl = count_flops(apply, variables, x0)["flops"]

        def run(v, stacked, reps):
            def body(i, acc):
                xs = [s[i % NB] for s in stacked]
                return acc + apply(v, xs)
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))

        f = jax.jit(run)
        reps = jnp.int32(args.reps)
        t0 = time.time()
        float(f(variables, stacked, reps))
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(f(variables, stacked, reps))
            ts.append(time.time() - t0)
        ms = (min(ts) - RPC_FLOOR_S) / args.reps * 1000
        return ms, comp, fl

    if args.probes == "branches":
        stages = extra
    elif args.probes == "all":
        stages = stages + extra

    total_ms, total_fl = 0.0, 0.0
    in_sum = {"stem", "stage1", "stage2", "stage3", "stage4"}
    for name, mod, inputs in stages:
        ms, comp, fl = timed(mod, inputs)
        tfs = fl / (ms / 1000) / 1e12 if fl > 0 else -1
        if name in in_sum:
            total_ms += ms
            total_fl += fl
        print(f"{name:12s}: {ms:7.2f} ms  {fl/1e9:7.1f} GFLOP  "
              f"{tfs:6.1f} TFLOP/s  (compile {comp:.0f}s)", flush=True)
    if args.probes != "branches":
        print(f"{'sum':12s}: {total_ms:7.2f} ms  {total_fl/1e9:7.1f} GFLOP  "
              f"(stem+s1+s2+s3+s4; transitions/head excluded)")


if __name__ == "__main__":
    main()
