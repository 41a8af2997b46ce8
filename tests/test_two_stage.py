"""PointPillars + TwoStageDetector end-to-end fixtures (VERDICT item 7).

Mirrors the reference detection stack: PFN reader -> scatter -> RPN ->
CenterHead (point_pillars.py) and the CenterPoint two-stage refinement
(two_stage.py: BEV extraction at proposals + RoIHead IoU scoring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.models import build_detector
from lidarseg3d_tpu.core.center_targets import assign_center_targets
from lidarseg3d_tpu.core.voxelize import VoxelGenerator
from lidarseg3d_tpu.datasets.batching import collate_segnet
from lidarseg3d_tpu.ops import box_ops

PCR = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
VSZ_PILLAR = [0.1, 0.1, 4.0]  # single z bin -> pillars
VSZ = [0.1, 0.1, 0.25]


def make_example(B=2, vsz=VSZ, nz=17, with_gt=False, seed=0):
    rng = np.random.default_rng(seed)
    vg = VoxelGenerator(vsz, PCR, max_num_points=8, max_voxels=1500)
    frames, targets, gts = [], [], []
    for _ in range(B):
        pts = np.stack([rng.uniform(-8, 8, 600), rng.uniform(-8, 8, 600),
                        rng.uniform(-2, 2, 600), rng.uniform(0, 1, 600)],
                       1).astype(np.float32)
        voxels, coords, npts = vg.generate(pts)
        frames.append({"voxels": voxels, "coordinates": coords,
                       "num_points_per_voxel": npts, "points": pts})
        boxes = np.array([[2.0, 3.0, 0.5, 1.6, 3.2, 1.5, 0.3]], np.float32)
        targets.append(assign_center_targets(
            boxes, np.array([0]), [[0]], grid_hw=(20, 20), voxel_size=vsz,
            pc_range=PCR, out_factor=8, max_objs=10))
        g = np.zeros((4, 8), np.float32)
        g[0, :7] = boxes[0]
        g[0, 7] = 1.0  # class id, 1-based
        gts.append(g)
    batch = collate_segnet(frames, max_voxels=1024, max_points=600)
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}
    ex["input_shape"] = (nz, 160, 160)
    ntasks = len(targets[0])
    ex["det_targets"] = [
        {k: jnp.asarray(np.stack([tb[t][k] for tb in targets]))
         for k in targets[0][t]}
        for t in range(ntasks)
    ]
    if with_gt:
        ex["gt_boxes_and_cls"] = jnp.asarray(np.stack(gts))
    return ex


def pp_cfg():
    return dict(
        type="PointPillars",
        reader=dict(type="PillarFeatureNet", num_input_features=4,
                    num_filters=(32, 32), voxel_size=VSZ_PILLAR,
                    pc_range=PCR),
        backbone=dict(type="PointPillarsScatter", num_input_features=32),
        # scatter canvas is stride-1 (160x160): downsample to /8 to match
        # the out_factor=8 center targets
        neck=dict(type="RPN", layer_nums=(2, 2), ds_layer_strides=(8, 2),
                  ds_num_filters=(32, 64), us_layer_strides=(1, 2),
                  us_num_filters=(32, 32), num_input_features=32),
        bbox_head=dict(type="CenterHead", in_channels=64,
                       tasks=(dict(num_class=1, class_names=["car"]),),
                       weight=0.25, code_weights=(1.0,) * 8),
        test_cfg=dict(voxel_size=VSZ_PILLAR[:2], pc_range=PCR[:2],
                      out_size_factor=8, score_threshold=0.0),
    )


def test_pointpillars_forward_loss_decode():
    model = build_detector(pp_cfg())
    ex = make_example(vsz=VSZ_PILLAR, nz=1)
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)

    def loss_fn(params):
        v = {"params": params,
             "batch_stats": variables.get("batch_stats", {})}
        (rets, bat), _ = model.apply(v, ex, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.PRNGKey(1)})
        loss, ld = model.loss(rets, bat)
        return loss, ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert g > 0 and np.isfinite(g)

    rets, bat = model.apply(variables, ex, train=False)
    dets = model.predict(rets, bat)
    assert dets["box3d_lidar"].shape[-1] == 7
    assert np.isfinite(np.asarray(dets["box3d_lidar"])).all()


def two_stage_cfg():
    first = dict(
        type="VoxelNet",
        reader=dict(type="MeanVoxelFeatureExtractor", num_input_features=4),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=4),
        neck=dict(type="RPN", layer_nums=(2, 2), ds_layer_strides=(1, 2),
                  ds_num_filters=(32, 64), us_layer_strides=(1, 2),
                  us_num_filters=(32, 32), num_input_features=256),
        bbox_head=dict(type="CenterHead", in_channels=64,
                       tasks=(dict(num_class=1, class_names=["car"]),),
                       weight=0.25, code_weights=(1.0,) * 8),
    )
    return dict(
        type="TwoStageDetector",
        first_stage_cfg=first,
        second_stage_modules=(dict(
            type="BEVFeatureExtractor", pc_start=PCR[:2],
            voxel_size=VSZ[:2], out_stride=8),),
        roi_head=dict(
            type="RoIHead", input_channels=64 * 5, num_class=1, code_size=7,
            model_cfg=dict(
                SHARED_FC=(64, 64), CLS_FC=(32, 32), REG_FC=(32, 32),
                DP_RATIO=0.0,
                TARGET_CONFIG=dict(REG_FG_THRESH=0.55, CLS_FG_THRESH=0.75,
                                   CLS_BG_THRESH=0.25),
                LOSS_CONFIG=dict(LOSS_WEIGHTS=dict(
                    rcnn_cls_weight=1.0, rcnn_reg_weight=1.0,
                    code_weights=[1.0] * 7)),
            )),
        NMS_POST_MAXSIZE=32,
        num_point=5,
        test_cfg=dict(voxel_size=VSZ[:2], pc_range=PCR[:2],
                      out_size_factor=8, score_threshold=0.0),
    )


def test_two_stage_forward_loss_predict():
    model = build_detector(two_stage_cfg())
    ex = make_example(with_gt=True)
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)

    def loss_fn(params):
        v = {"params": params,
             "batch_stats": variables.get("batch_stats", {})}
        (rets, bat), _ = model.apply(v, ex, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.PRNGKey(1)})
        loss, ld = model.loss(rets, bat)
        return loss, (ld, rets)

    (loss, (ld, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "rcnn_loss_cls" in ld and "rcnn_loss_reg" in ld
    g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert g > 0 and np.isfinite(g)

    rets, bat = model.apply(variables, ex, train=False)
    out = model.predict(rets, bat)
    assert out["box3d_lidar"].shape == (2, 32, 7)
    assert np.isfinite(np.asarray(out["box3d_lidar"])).all()
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_two_stage_freeze_stops_first_stage():
    """freeze=True (reference single_det.freeze()): first stage gets no
    gradients, contributes no loss term, and its BN stats don't update."""
    cfg = two_stage_cfg()
    cfg["freeze"] = True
    model = build_detector(cfg)
    ex = make_example(with_gt=True)
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)

    def loss_fn(params):
        v = {"params": params,
             "batch_stats": variables.get("batch_stats", {})}
        (rets, bat), mut = model.apply(
            v, ex, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        loss, ld = model.loss(rets, bat)
        return loss, (ld, mut)

    (loss, (ld, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert set(ld) == {"rcnn_loss_cls", "rcnn_loss_reg", "loss"}
    g_first = sum(
        float(jnp.abs(l).sum())
        for l in jax.tree_util.tree_leaves(grads["single_det"]))
    g_roi = sum(
        float(jnp.abs(l).sum())
        for l in jax.tree_util.tree_leaves(grads["roi_head_mod"]))
    assert g_first == 0.0 and g_roi > 0
    # frozen first-stage BN stats unchanged
    for path in ("single_det",):
        before = jax.tree_util.tree_leaves(variables["batch_stats"][path])
        after = jax.tree_util.tree_leaves(mut["batch_stats"][path])
        for b, a in zip(before, after):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_roi_target_assignment_geometry():
    """A roi exactly on a gt gets IoU 1, canonical-frame residual 0, and
    cls label 1; a far roi gets label 0 and no fg flag."""
    from lidarseg3d_tpu.models.roi_heads.roi_head import assign_targets

    gt = jnp.asarray(
        np.array([[[2.0, 3.0, 0.5, 1.6, 3.2, 1.5, 0.3],
                   [0.0] * 7]], np.float32))
    gcls = jnp.asarray(np.array([[1, 0]], np.int32))
    gval = jnp.asarray(np.array([[True, False]]))
    rois = jnp.asarray(
        np.array([[[2.0, 3.0, 0.5, 1.6, 3.2, 1.5, 0.3],
                   [-6.0, -6.0, 0.0, 1.0, 1.0, 1.0, 0.0]]], np.float32))
    rlab = jnp.asarray(np.array([[1, 1]], np.int32))
    t = assign_targets(rois, rlab, gt, gcls, gval,
                       dict(REG_FG_THRESH=0.55))
    got = np.asarray(t["gt_of_rois"])[0, 0]
    # residual encoding (roi_head_template.py:54 subtracts rois[:, :, :6]):
    # exact-match roi -> zero residual center AND dims
    np.testing.assert_allclose(got[:3], 0.0, atol=1e-5)
    np.testing.assert_allclose(got[3:6], 0.0, atol=1e-5)
    np.testing.assert_allclose(got[6], 0.0, atol=1e-5)
    assert bool(t["reg_fg"][0, 0]) and not bool(t["reg_fg"][0, 1])
    assert float(t["cls_labels"][0, 0]) == 1.0
    assert float(t["cls_labels"][0, 1]) == 0.0


def test_encode_decode_roundtrip():
    """generate_predicted_boxes(encode_gt_of_rois(rois, gt)) must recover
    gt exactly (mod pi heading symmetry) — catches encode/decode frame
    mismatches like absolute-vs-residual dims."""
    from lidarseg3d_tpu.models.roi_heads.roi_head import (
        RoIHead, encode_gt_of_rois,
    )

    rng = np.random.RandomState(3)
    rois = np.concatenate([
        rng.uniform(-10, 10, (1, 8, 3)),
        rng.uniform(0.8, 4.0, (1, 8, 3)),
        rng.uniform(-np.pi, np.pi, (1, 8, 1)),
    ], axis=-1).astype(np.float32)
    gt = rois + np.concatenate([
        rng.uniform(-0.4, 0.4, (1, 8, 3)),
        rng.uniform(-0.2, 0.2, (1, 8, 3)),
        rng.uniform(-0.3, 0.3, (1, 8, 1)),
    ], axis=-1).astype(np.float32)
    enc = encode_gt_of_rois(jnp.asarray(rois), jnp.asarray(gt))
    dec = np.asarray(RoIHead.generate_predicted_boxes(jnp.asarray(rois), enc))
    np.testing.assert_allclose(dec[..., :6], gt[..., :6], atol=1e-4)
    dry = (dec[..., 6] - gt[..., 6] + np.pi / 2) % np.pi - np.pi / 2
    np.testing.assert_allclose(dry, 0.0, atol=1e-4)


def test_opposite_heading_flip():
    """gt rotated by ~pi relative to the roi encodes a near-zero heading
    residual (boxes are orientation-symmetric)."""
    from lidarseg3d_tpu.models.roi_heads.roi_head import encode_gt_of_rois

    roi = jnp.asarray(np.array([[[0.0, 0, 0, 2, 4, 1.5, 0.2]]], np.float32))
    gt = jnp.asarray(
        np.array([[[0.0, 0, 0, 2, 4, 1.5, 0.2 + np.pi - 0.05]]], np.float32))
    enc = np.asarray(encode_gt_of_rois(roi, gt))
    assert abs(enc[0, 0, 6]) < 0.06


def test_bilinear_bev_extract():
    from lidarseg3d_tpu.models.second_stage.bev_extractor import (
        bilinear_interpolate,
    )

    fmap = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # exact grid point
    v = bilinear_interpolate(fmap, jnp.asarray([2.0]), jnp.asarray([1.0]))
    assert float(v[0, 0]) == 6.0
    # midpoint average
    v = bilinear_interpolate(fmap, jnp.asarray([0.5]), jnp.asarray([0.5]))
    assert abs(float(v[0, 0]) - np.mean([0, 1, 4, 5])) < 1e-5


def test_deform_conv_zero_offsets_equal_plain_conv():
    """DCN v1 with zero offsets reduces exactly to a 3x3 conv with zero
    padding (bilinear at integer positions is an exact gather)."""
    from lidarseg3d_tpu.models.bbox_heads.center_head import deform_conv2d

    rng = np.random.default_rng(0)
    B, H, W, C, Cout = 2, 9, 11, 8, 6
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(9, C, Cout)).astype(np.float32))
    off = jnp.zeros((B, H, W, 4 * 9 * 2), np.float32)
    got = np.asarray(deform_conv2d(x, off, w, deformable_groups=4))

    # plain conv oracle via lax.conv
    wk = np.asarray(w).reshape(3, 3, C, Cout)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(wk), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_centerhead_dcn_variant():
    from lidarseg3d_tpu.models.bbox_heads.center_head import CenterHead

    head = CenterHead(in_channels=32, share_conv_channel=32,
                      tasks=(dict(num_class=2, class_names=["car", "ped"]),),
                      dcn_head=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 32)).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    rets = head.apply(variables, x, train=False)
    assert rets[0]["hm"].shape == (1, 12, 12, 2)
    assert rets[0]["reg"].shape == (1, 12, 12, 2)
    assert np.isfinite(np.asarray(rets[0]["hm"])).all()
    names = str(jax.tree_util.tree_structure(variables))
    assert "FeatureAdaption" in names
