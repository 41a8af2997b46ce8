#!/usr/bin/env python
"""Per-stage attribution of the MSeg3D flagship inference forward on TPU.

Times, as SEPARATE amortized jit programs over NB distinct synthetic scans
(bench.py discipline: fori_loop, traced trip count, i%NB input indexing so
nothing is loop-invariant, one scalar fetch, RPC floor subtracted):

  full    - whole SegMSeg3DNet forward + predict (what bench.py measures)
  img     - camera branch only (HRNet -> FCN head, B*ncam images)
  voxel   - lidar branch only (reader -> structure/books -> sparse UNet)
  books   - structure + table + rulebook chain only (the UNet's exact
            build sequence, no conv compute)
  head    - fusion point head only (devoxelization 3-NN, cuv sampling,
            GF/SF-Phase, logits) fed recorded branch outputs

Stage programs use flax method= application of the SAME full model, so
parameters and module structure are identical to the full forward.
conv-compute ~= voxel - books; fusion overhead ~= full - img - voxel - head
(XLA may overlap stages inside `full`, so the parts can sum to more than
the whole).

Run: PYTHONPATH=/root/repo python tools/bench/mb_flagship_stages.py
     [--config semkitti|semnusc] [--reps 6]
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
    ap.add_argument("--config", default="semkitti",
                    choices=["semkitti", "semnusc"])
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--stages", nargs="+",
                    default=["books", "img", "voxel", "head", "full"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from __graft_entry__ import (
        _mseg3d_model_cfg, _synthetic_mseg3d_batch, PCR, VSZ,
    )
    from lidarseg3d_tpu.models import build_detector
    from lidarseg3d_tpu.ops import sparse as sp

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

    # ---- stage bodies (method= application of the same bound modules) ----
    def m_full(mod, e):
        ret, bat = mod(e, train=False)
        return mod.predict(ret, bat)["pred_point_sem_labels"].sum()

    def m_img(mod, e):
        images = e["images"]
        B, nc = images.shape[:2]
        imgs = images.reshape(B * nc, *images.shape[2:])
        f = mod.img_backbone_mod(imgs, train=False)
        out = mod.img_head_mod(f, batch_size=B, train=False)
        return (out["image_features"].sum()
                + out["camera_semantic_embeddings"].sum())

    def m_voxel(mod, e):
        vf = mod.reader_mod(e["voxels"], e["num_points"], e["coordinates"],
                            train=False)
        struct = sp.build_structure(e["coordinates"], e["num_voxels"],
                                    e["input_shape"])
        st = sp.SparseTensor(structure=struct, features=vf)
        bb = mod.backbone_mod(st, train=False)
        return bb["conv_point_features"].sum()

    def m_branches(mod, e):
        images = e["images"]
        B, nc = images.shape[:2]
        imgs = images.reshape(B * nc, *images.shape[2:])
        f = mod.img_backbone_mod(imgs, train=False)
        img_out = mod.img_head_mod(f, batch_size=B, train=False)
        vf = mod.reader_mod(e["voxels"], e["num_points"], e["coordinates"],
                            train=False)
        struct = sp.build_structure(e["coordinates"], e["num_voxels"],
                                    e["input_shape"])
        st = sp.SparseTensor(structure=struct, features=vf)
        bb = mod.backbone_mod(st, train=False)
        batch = dict(e)
        batch.update(bb)
        batch.update(img_out)
        batch.pop("images")
        return batch

    def m_head(mod, batch):
        ret = mod.point_head_mod(batch, train=False)
        return jnp.argmax(ret["out_logits"], -1).sum()

    def books_chain(e):
        # replicate UNetSCN3D's exact build sequence (unet_scn.py:47-72)
        caps = (0.5, 0.25, 0.15)
        s1 = sp.build_structure(e["coordinates"], e["num_voxels"],
                                e["input_shape"])
        Vc = s1.capacity
        t1 = sp.dense_table(s1)
        acc = sp.build_subm_rulebook(s1, table=t1)[0].reshape(-1)[::4096].sum()
        s_prev, t_prev = s1, t1
        for ci, pad in zip(caps, (1, 1, (0, 1, 1))):
            s_nxt = sp.downsample_structure(
                s_prev, 2, capacity=max(1, int(Vc * ci)), padding=pad)
            rb_d = sp.build_strided_rulebook(s_prev, s_nxt, 3, 2, pad,
                                             table=t_prev)
            t_nxt = sp.dense_table(s_nxt)
            rb_s = sp.build_subm_rulebook(s_nxt, table=t_nxt)
            rb_i = sp.build_inverse_rulebook(s_nxt, s_prev, 3, 2, pad,
                                             table=t_nxt)
            acc = (acc + rb_d[0].reshape(-1)[::4096].sum()
                   + rb_s[0].reshape(-1)[::4096].sum()
                   + rb_i[0].reshape(-1)[::4096].sum())
            s_prev, t_prev = s_nxt, t_nxt
        return acc

    # record branch outputs for the head-only program
    head_in = None
    if "head" in args.stages:
        rec = jax.jit(lambda v, e2: model.apply(
            v, {**e2, "input_shape": ishape}, method=m_branches))
        outs = [rec(variables, e) for e in exs]
        head_in = jax.tree.map(lambda *a: jnp.stack(a), *outs)
        jax.block_until_ready(head_in)

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

    results = {}
    for stage in args.stages:
        if stage == "books":
            ms, comp = timed(
                lambda v, x: books_chain(
                    {**x, "input_shape": ishape}).astype(jnp.float32),
                stacked)
        elif stage == "head":
            ms, comp = timed(
                lambda v, x: model.apply(
                    v, {**x, "input_shape": ishape},
                    method=m_head).astype(jnp.float32),
                head_in)
        else:
            meth = {"full": m_full, "img": m_img, "voxel": m_voxel}[stage]
            ms, comp = timed(
                lambda v, x, meth=meth: model.apply(
                    v, {**x, "input_shape": ishape},
                    method=meth).astype(jnp.float32),
                stacked)
        results[stage] = ms
        print(f"{args.config} {stage:6s}: {ms:7.1f} ms  (compile {comp:.0f}s)",
              flush=True)

    if all(k in results for k in ("full", "img", "voxel", "head")):
        resid = (results["full"] - results["img"] - results["voxel"]
                 - results["head"])
        print(f"{args.config} residual (full - img - voxel - head): "
              f"{resid:.1f} ms")
    if "books" in results and "voxel" in results:
        print(f"{args.config} conv-compute (voxel - books): "
              f"{results['voxel'] - results['books']:.1f} ms")


if __name__ == "__main__":
    main()
