#!/usr/bin/env python
"""Sub-stage attribution INSIDE the MSeg3D fusion point head on TPU.

The head was measured as the largest stage of the flagship forward
(mb_flagship_stages.py). This script times its pieces as separate amortized
jit programs (bench.py discipline) on recorded branch outputs:

  interp  - grid_three_interpolate devoxelization (27+2-candidate 3-NN)
  cuv     - sample_points_cuv bilinear point-to-pixel sampling
  sffm    - SemanticFeatureFusionModule (6-layer decoder over N points),
            standalone init, flagship dims
  voxmlp  - voxel aux classifier MLP over [B, V, C]
  sememb  - lidar_semantic_embeddings (softmax over voxels + einsum)
  head    - the whole head (reference for the sum)

Run: PYTHONPATH=/root/repo python tools/bench/mb_head_stages.py
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from __graft_entry__ import (
        _mseg3d_model_cfg, _synthetic_mseg3d_batch, PCR, VSZ,
    )
    from lidarseg3d_tpu.models import build_detector
    from lidarseg3d_tpu.models.point_heads.mseg3d_head import (
        SemanticFeatureFusionModule, lidar_semantic_embeddings,
    )
    from lidarseg3d_tpu.models.layers import MLPHead
    from lidarseg3d_tpu.ops import grid_sample as gs
    from lidarseg3d_tpu.ops import interpolate as interp
    from lidarseg3d_tpu.ops import sparse as sp

    if args.config == "semkitti":
        pcr, vsz, V, N = PCR, VSZ, 131072, 122880
        img_hw, ncam, ncls, bf16 = (384, 1280), 1, 20, False
    else:
        pcr, vsz = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), (0.1, 0.1, 0.2)
        V, N = 120000, 100000
        img_hw, ncam, ncls, bf16 = (640, 960), 6, 17, True

    grid = np.round((np.asarray(pcr[3:]) - np.asarray(pcr[:3]))
                    / np.asarray(vsz)).astype(int)
    ishape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
    model = build_detector(_mseg3d_model_cfg(
        num_class=ncls, ratio=2, img_hw=img_hw, pcr=pcr, vsz=vsz,
        img_bf16=bf16))
    head_cfg = _mseg3d_model_cfg(num_class=ncls, ratio=2)["point_head"][
        "model_cfg"]

    exs = []
    for s in range(NB):
        b = _synthetic_mseg3d_batch(1, V, N, img_hw=img_hw, ncam=ncam,
                                    seed=s, pcr=pcr, vsz=vsz)
        exs.append({k: jnp.asarray(v) for k, v in b.items()
                    if k != "metadata"})

    @jax.jit
    def init(rng, arrs):
        e = dict(arrs)
        e["input_shape"] = ishape
        return model.init(rng, e, train=False)

    variables = init(jax.random.PRNGKey(0), exs[0])
    jax.block_until_ready(variables)

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

    rec = jax.jit(lambda v, e: model.apply(
        v, {**e, "input_shape": ishape}, method=m_branches))
    outs = [rec(variables, e) for e in exs]
    head_in = jax.tree.map(lambda *a: jnp.stack(a), *outs)
    jax.block_until_ready(head_in)

    def timed(body_fn, params=None):
        def run(params, inputs, reps):
            def body(i, acc):
                x = jax.tree.map(lambda a: a[i % NB], inputs)
                return acc + body_fn(params, x).astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))

        f = jax.jit(run)
        reps = jnp.int32(args.reps)
        t0 = time.time()
        float(f(params, head_in, reps))
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(f(params, head_in, reps))
            ts.append(time.time() - t0)
        return (min(ts) - RPC_FLOOR_S) / args.reps * 1000, comp

    # --- interp ---
    def interp_body(_, x):
        out = interp.grid_three_interpolate(
            x["points"][..., :3], x["point_valid"], x["conv_structure"],
            x["conv_point_features"], vsz, pcr, table=x.get("conv_table"),
            subm_rulebook=x.get("conv_subm_rulebook"))
        return out.sum()

    ms, c = timed(interp_body)
    print(f"{args.config} interp : {ms:7.1f} ms (compile {c:.0f}s)",
          flush=True)

    # --- cuv sample ---
    def cuv_body(_, x):
        imf = x["image_features"]
        B = x["points_cuv"].shape[0]
        img5 = imf.reshape(B, imf.shape[0] // B, *imf.shape[1:])
        return gs.sample_points_cuv(img5, x["points_cuv"]).sum()

    ms, c = timed(cuv_body)
    print(f"{args.config} cuv    : {ms:7.1f} ms (compile {c:.0f}s)",
          flush=True)

    # --- sffm (standalone params, flagship dims) ---
    sfc = head_cfg["SFPhase_CFG"]
    sffm = SemanticFeatureFusionModule(
        d_input_point=head_cfg["GEO_FUSED_DIM"], d_model=sfc["d_model"],
        n_head=sfc["n_head"], n_layer=sfc["n_layer"], n_ffn=sfc["n_ffn"])
    geo0 = jnp.zeros((NB, 1, N, head_cfg["GEO_FUSED_DIM"]), jnp.float32)
    emb_c0 = jnp.zeros((NB, 1, ncls, 48), jnp.float32)
    emb_l0 = jnp.zeros((NB, 1, ncls, 32), jnp.float32)
    sffm_vars = jax.jit(sffm.init)(
        jax.random.PRNGKey(1), geo0[0], emb_c0[0], emb_l0[0])
    jax.block_until_ready(sffm_vars)

    def sffm_body(params, x):
        i = x["conv_point_features"][..., :1].sum() * 0
        geo = geo0[0] + i  # depend on the indexed input: nothing hoistable
        return sffm.apply(params, geo, emb_c0[0], emb_l0[0]).sum()

    ms, c = timed(sffm_body, sffm_vars)
    print(f"{args.config} sffm   : {ms:7.1f} ms (compile {c:.0f}s)",
          flush=True)

    # --- voxel aux MLP ---
    vox_mlp = MLPHead(tuple(head_cfg["VOXEL_CLS_FC"]), ncls)
    feats0 = outs[0]["conv_point_features"]
    mlp_vars = jax.jit(
        lambda r, f, m: vox_mlp.init(r, f, mask=m, train=False)
    )(jax.random.PRNGKey(2), feats0, feats0[..., 0] > 0)
    jax.block_until_ready(mlp_vars)

    def voxmlp_body(params, x):
        f = x["conv_point_features"]
        m = x["conv_structure"].valid_mask()
        return vox_mlp.apply(params, f, mask=m, train=False).sum()

    ms, c = timed(voxmlp_body, mlp_vars)
    print(f"{args.config} voxmlp : {ms:7.1f} ms (compile {c:.0f}s)",
          flush=True)

    # --- lidar semantic embeddings ---
    def sememb_body(_, x):
        f = x["conv_point_features"]
        m = x["conv_structure"].valid_mask()
        logits = jnp.tanh(f[..., :ncls])  # stand-in logits, same shape
        return lidar_semantic_embeddings(f, logits, m).sum()

    ms, c = timed(sememb_body)
    print(f"{args.config} sememb : {ms:7.1f} ms (compile {c:.0f}s)",
          flush=True)

    # --- whole head (reference) ---
    def head_body(v, x):
        ret = model.apply(v, {**x, "input_shape": ishape},
                          method=lambda mod, b: mod.point_head_mod(
                              b, train=False))
        return jnp.argmax(ret["out_logits"], -1).sum()

    ms, c = timed(head_body, variables)
    print(f"{args.config} head   : {ms:7.1f} ms (compile {c:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
