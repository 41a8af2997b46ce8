#!/usr/bin/env python
"""Sub-stage attribution INSIDE the MSeg3D image branch on TPU.

The camera branch was measured at 46.9 ms of the 157 ms semnusc flagship
forward (mb_flagship_stages.py). This script times its pieces as separate
amortized jit programs (bench.py discipline: fori_loop, traced trip count,
i%NB inputs, one scalar fetch, RPC floor subtracted):

  hrnet   - HRNet backbone only (6x 640x960 -> 4 branch feature maps)
  fcn     - FCNMSeg3DHead only (branch upsample+concat, conv, SFAM camera
            embeddings) on recorded backbone features
  img     - backbone + head together (reference for the sum)

Run: PYTHONPATH=/root/repo python tools/bench/mb_img_stages.py
     [--config semnusc|semkitti] [--reps 6]
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
    ap.add_argument("--config", default="semnusc",
                    choices=["semkitti", "semnusc"])
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import (
        _mseg3d_model_cfg, _synthetic_mseg3d_batch, PCR, VSZ,
    )
    from lidarseg3d_tpu.models import build_detector

    if args.config == "semkitti":
        pcr, vsz, V, N = PCR, VSZ, 131072, 122880
        img_hw, ncam, ncls, bf16 = (384, 1280), 1, 20, False
    else:
        pcr, vsz = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), (0.1, 0.1, 0.2)
        # right-sized capacities matching bench.py's shipping config (r4):
        # nuScenes nsweeps=1 keyframes are <= 34,688 points, padded to 40960
        V, N = 40960, 40960
        img_hw, ncam, ncls, bf16 = (640, 960), 6, 17, True

    grid = np.round((np.asarray(pcr[3:]) - np.asarray(pcr[:3]))
                    / np.asarray(vsz)).astype(int)
    ishape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
    model = build_detector(_mseg3d_model_cfg(
        num_class=ncls, ratio=2, img_hw=img_hw, pcr=pcr, vsz=vsz,
        img_bf16=bf16))

    exs = []
    for s in range(NB):
        b = _synthetic_mseg3d_batch(1, V, N, img_hw=img_hw, ncam=ncam,
                                    seed=s, pcr=pcr, vsz=vsz)
        exs.append({k: jnp.asarray(v) for k, v in b.items()
                    if k != "metadata"})
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *exs)

    @jax.jit
    def init(rng, arrs):
        e = dict(arrs)
        e["input_shape"] = ishape
        return model.init(rng, e, train=False)

    variables = init(jax.random.PRNGKey(0), exs[0])
    jax.block_until_ready(variables)

    def m_hrnet(mod, e):
        images = e["images"]
        B, nc = images.shape[:2]
        imgs = images.reshape(B * nc, *images.shape[2:])
        f = mod.img_backbone_mod(imgs, train=False)
        return sum(jnp.sum(x).astype(jnp.float32) for x in f)

    def m_feats(mod, e):
        images = e["images"]
        B, nc = images.shape[:2]
        imgs = images.reshape(B * nc, *images.shape[2:])
        return mod.img_backbone_mod(imgs, train=False)

    def m_fcn(mod, feats):
        out = mod.img_head_mod(feats, batch_size=1, train=False)
        return (out["image_features"].sum()
                + out["camera_semantic_embeddings"].sum()
                ).astype(jnp.float32)

    def m_img(mod, e):
        images = e["images"]
        B, nc = images.shape[:2]
        imgs = images.reshape(B * nc, *images.shape[2:])
        f = mod.img_backbone_mod(imgs, train=False)
        out = mod.img_head_mod(f, batch_size=B, train=False)
        return (out["image_features"].sum()
                + out["camera_semantic_embeddings"].sum()
                ).astype(jnp.float32)

    rec = jax.jit(lambda v, e2: model.apply(
        v, {**e2, "input_shape": ishape}, method=m_feats))
    feats = [rec(variables, e) for e in exs]
    feats = jax.tree.map(lambda *a: jnp.stack(a), *feats)
    jax.block_until_ready(feats)

    def timed(make_body, inputs):
        def run(variables, inputs, reps):
            def body(i, acc):
                x = jax.tree.map(lambda a: a[i % NB], inputs)
                return acc + make_body(variables, x)

            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))

        f = jax.jit(run)
        reps = jnp.int32(args.reps)
        t0 = time.time()
        float(f(variables, inputs, reps))
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(f(variables, inputs, reps))
            ts.append(time.time() - t0)
        return (min(ts) - RPC_FLOOR_S) / args.reps * 1000, comp

    for name, body, inp in (
        ("hrnet", m_hrnet, stacked),
        ("fcn", m_fcn, feats),
        ("img", m_img, stacked),
    ):
        ms, comp = timed(
            lambda v, x, b=body: model.apply(v, x, method=b), inp)
        print(f"{args.config} {name:6s}: {ms:7.1f} ms (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
