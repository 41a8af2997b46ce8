"""SegMSeg3DNet end-to-end smoke test: tiny HRNet + fusion head on
synthetic multi-camera scans."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.models import build_detector

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the default tier (VERDICT r4 item 3)


PCR = [-4.0, -4.0, -1.0, 4.0, 4.0, 1.0]
VSZ = [0.25, 0.25, 0.25]
NCLS = 8
NCAM = 2
IMH, IMW = 32, 64

TINY_HRNET = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(4, 8)),
    stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)


def model_cfg():
    return dict(
        type="SegMSeg3DNet",
        img_backbone=dict(type="HRNet", extra=TINY_HRNET, frozen_stages=-1),
        img_head=dict(
            type="FCNMSeg3DHead", in_channels=(4, 8, 16, 32),
            in_index=(0, 1, 2, 3), channels=12, num_convs=1,
            num_classes=NCLS, ignore_index=0, loss_weight=0.5,
            concat_input=False,
        ),
        reader=dict(type="ImprovedMeanVoxelFeatureExtractor",
                    num_input_features=4),
        backbone=dict(type="UNetSCN3D", num_input_features=12,
                      point_cloud_range=PCR, voxel_size=VSZ,
                      model_cfg=dict(SCALING_RATIO=1)),
        point_head=dict(
            type="PointSegMSeg3DHead", class_agnostic=False, num_class=NCLS,
            model_cfg=dict(
                VOXEL_IN_DIM=16, VOXEL_CLS_FC=[16], VOXEL_ALIGN_DIM=16,
                IMAGE_IN_DIM=12, IMAGE_ALIGN_DIM=16, GEO_FUSED_DIM=16,
                OUT_CLS_FC=[16, 16], IGNORED_LABEL=0, DP_RATIO=0.25,
                MIMIC_FC=[16, 16],
                SFPhase_CFG=dict(embeddings_proj_kernel_size=1, d_model=16,
                                 n_head=4, n_layer=2, n_ffn=32, drop_ratio=0,
                                 activation="relu", pre_norm=False),
            ),
        ),
    )


def make_example(B=2, N=300, V=400, seed=0):
    from lidarseg3d_tpu.core.voxelize import (
        VoxelGenerator, encode_compact_value_labels,
    )
    from lidarseg3d_tpu.datasets.batching import collate_segnet

    rng = np.random.default_rng(seed)
    vg = VoxelGenerator(VSZ, PCR, max_num_points=5, max_voxels=V)
    frames = []
    for _ in range(B):
        pts = np.stack([rng.uniform(-4, 4, N), rng.uniform(-4, 4, N),
                        rng.uniform(-1, 1, N), rng.uniform(0, 1, N)],
                       1).astype(np.float32)
        labels = rng.integers(0, NCLS, N).astype(np.int32)
        src = np.concatenate([pts, labels[:, None].astype(np.float32) + 1], 1)
        voxels, coords, npts = vg.generate(src)
        frames.append({
            "voxels": voxels[:, :, :4], "coordinates": coords,
            "num_points_per_voxel": npts, "points": pts,
            "voxel_sem_labels": encode_compact_value_labels(
                voxels[:, :, 4].astype(np.int64)).astype(np.int32),
            "point_sem_labels": labels,
        })
    batch = collate_segnet(frames, max_voxels=V, max_points=N)
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}

    grid = np.round((np.asarray(PCR[3:]) - np.asarray(PCR[:3]))
                    / np.asarray(VSZ)).astype(int)
    ex["input_shape"] = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    ex["images"] = jnp.asarray(
        rng.uniform(0, 1, (B, NCAM, IMH, IMW, 3)).astype(np.float32))
    # points_cuv: ~60% of points in view
    valid = (rng.random((B, N)) < 0.6).astype(np.float32)
    cuv = np.stack([
        valid,
        rng.choice([-1.0, 1.0], (B, N)),  # cam (2 cams -> exact +-1)
        rng.uniform(-1, 1, (B, N)),       # v
        rng.uniform(-1, 1, (B, N)),       # u
    ], -1).astype(np.float32)
    ex["points_cuv"] = jnp.asarray(cuv)
    ilab = rng.integers(0, NCLS, (B * NCAM, IMH, IMW)).astype(np.int32)
    ilab[rng.random(ilab.shape) < 0.9] = 0  # sparse pixel labels
    ex["images_sem_labels"] = jnp.asarray(ilab)
    return ex


@pytest.fixture(scope="module")
def setup():
    model = build_detector(model_cfg())
    ex = make_example()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ex, train=False,
    )
    return model, variables, ex


def test_mseg3d_forward_and_loss(setup):
    model, variables, ex = setup

    def loss_fn(p):
        (ret, bat), newv = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, ex,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        loss, ld = model.loss(ret, bat)
        return loss, ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    for k in ("voxel_ce_loss", "out_ce_loss", "out_mimic_loss",
              "image_ce_loss"):
        assert np.isfinite(float(ld[k])), k
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(grads))
    assert gsum > 0 and np.isfinite(gsum)


def test_mseg3d_predict(setup):
    model, variables, ex = setup
    ret, bat = model.apply(variables, ex, train=False)
    pred = model.predict(ret, bat)
    assert pred["pred_point_sem_labels"].shape == ex["points"].shape[:2]


def test_grid_sample_exactness():
    """Bilinear sampling at exact pixel centers returns exact values."""
    from lidarseg3d_tpu.ops.grid_sample import sample_points_cuv
    rng = np.random.default_rng(0)
    B, ncam, H, W, C = 1, 2, 8, 10, 3
    f = rng.standard_normal((B, ncam, H, W, C)).astype(np.float32)
    # pick pixel (3, 7) on cam 1: normalized align_corners=True coords
    cuv = np.array([[[1.0, 1.0, 2 * 3 / (H - 1) - 1, 2 * 7 / (W - 1) - 1],
                     [0.0, 1.0, 0.0, 0.0]]], np.float32)
    out = np.asarray(sample_points_cuv(jnp.asarray(f), jnp.asarray(cuv)))
    np.testing.assert_allclose(out[0, 0], f[0, 1, 3, 7], rtol=1e-5)
    np.testing.assert_array_equal(out[0, 1], 0)  # invalid point -> zeros


def test_resnet_backbone_shapes():
    from lidarseg3d_tpu.models import build_img_backbone
    m = build_img_backbone(dict(type="ResNetMMCV", depth=18, base_channels=8))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                       train=False)
    outs = m.apply(variables, jnp.ones((2, 64, 96, 3)), train=False)
    assert len(outs) == 4
    assert outs[0].shape == (2, 16, 24, 8)
    assert outs[3].shape == (2, 2, 3, 64)


def test_hrnet_norm_eval_freezes_bn_stats():
    """norm_eval=True (mmcv BaseModule.train() override): BN running stats
    stay fixed during training-mode forwards; weights still get grads."""
    from lidarseg3d_tpu.models import build_img_backbone

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 3)).astype(np.float32))
    m = build_img_backbone(dict(type="HRNet", extra=TINY_HRNET,
                                norm_eval=True))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
    for b, a in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                    jax.tree_util.tree_leaves(mut["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def loss_fn(params):
        outs = m.apply({"params": params,
                        "batch_stats": variables["batch_stats"]},
                       x, train=True, mutable=False)
        return sum(jnp.sum(o ** 2) for o in outs)

    grads = jax.grad(loss_fn)(variables["params"])
    g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert g > 0 and np.isfinite(g)


def test_mseg3d_full_remat_matches(setup):
    """ACT_REMAT (UNet stacks + SFFM decoder) + HRNet with_cp together keep
    the param tree, loss, and grads identical — the flagship's B>=4
    memory configuration is numerically free."""
    model, variables, ex = setup
    cfg = model_cfg()
    cfg["backbone"].setdefault("model_cfg", {})["ACT_REMAT"] = True
    cfg["point_head"].setdefault("model_cfg", {})["ACT_REMAT"] = True
    cfg["img_backbone"]["with_cp"] = True
    model_r = build_detector(cfg)
    var_r = model_r.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ex, train=False,
    )
    paths = lambda v: set(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(v)[0])
    assert paths(var_r) == paths(variables)

    def loss_grads(m, v):
        def f(p):
            (ret, bat), _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, ex,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return m.loss(ret, bat)[0]
        return jax.value_and_grad(f)(v["params"])

    l0, g0 = loss_grads(model, variables)
    l1, g1 = loss_grads(model_r, var_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        # atol floor 1e-7: leaves whose grads are numerically zero
        # (max ~1e-9, dead branches) reorder-noise above any rtol
        assert np.abs(a - b).max() <= 2e-5 * np.abs(a).max() + 1e-7


def test_img_branch_bf16_mixed_precision():
    """compute_dtype="bfloat16" on HRNet + FCNMSeg3DHead: params stay fp32
    (identical tree), outputs come back fp32 and track the fp32 branch
    within bf16 tolerance; grads flow and are finite.

    Runs in a FRESH subprocess (tests/_bf16_test_body.py): compiling the
    bf16-dtype conv programs on the XLA CPU backend segfaults
    nondeterministically deep inside a long pytest process (observed in
    compile, cache-read and cache-write phases across three full-suite
    runs) while the identical programs always pass in a fresh
    interpreter. TPU is the production backend for these programs."""
    import subprocess
    import sys

    body = os.path.join(os.path.dirname(__file__), "_bf16_test_body.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, body], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, f"bf16 body failed:\n{res.stdout}\n{res.stderr}"
    assert "BF16-OK" in res.stdout
