"""CenterHead detection slice: targets -> loss -> decode roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarseg3d_tpu.core.center_targets import assign_center_targets
from lidarseg3d_tpu.models import build_detector
from lidarseg3d_tpu.models.bbox_heads.center_head import (
    CenterHead, fast_focal_loss,
)

PCR = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
VSZ = [0.1, 0.1, 0.25]  # grid 160x160x16 -> bev 20x20 at /8


def test_target_assignment():
    boxes = np.array([[2.0, 3.0, 0.5, 1.6, 3.2, 1.5, 0.3],
                      [-4.0, -4.0, 0.0, 0.6, 0.8, 1.7, 0.0]], np.float32)
    classes = np.array([0, 1])
    tgts = assign_center_targets(
        boxes, classes, [[0], [1]], grid_hw=(20, 20),
        voxel_size=VSZ, pc_range=PCR, out_factor=8, max_objs=10,
    )
    assert len(tgts) == 2
    t0 = tgts[0]
    assert t0["mask"].sum() == 1
    assert t0["hm"].max() == 1.0
    cj, ci = np.unravel_index(np.argmax(t0["hm"][:, :, 0]), (20, 20))
    assert t0["ind"][0] == cj * 20 + ci
    # anno: log dims + sincos yaw
    np.testing.assert_allclose(t0["anno_box"][0, 3:6],
                               np.log([1.6, 3.2, 1.5]), rtol=1e-5)
    np.testing.assert_allclose(
        t0["anno_box"][0, 6:8], [np.sin(0.3), np.cos(0.3)], rtol=1e-5)


def test_focal_loss_prefers_correct_heatmap():
    rng = np.random.default_rng(0)
    hm_gt = np.zeros((1, 8, 8, 2), np.float32)
    hm_gt[0, 3, 4, 0] = 1.0
    ind = np.array([[3 * 8 + 4]])
    mask = np.array([[True]])
    cat = np.array([[0]])
    good = jnp.asarray(np.where(hm_gt > 0.5, 0.9, 0.05))
    bad = jnp.asarray(np.full_like(hm_gt, 0.5))
    lg = float(fast_focal_loss(good, jnp.asarray(hm_gt), jnp.asarray(ind),
                               jnp.asarray(mask), jnp.asarray(cat)))
    lb = float(fast_focal_loss(bad, jnp.asarray(hm_gt), jnp.asarray(ind),
                               jnp.asarray(mask), jnp.asarray(cat)))
    assert lg < lb


def make_det_example(B=2, seed=0):
    from lidarseg3d_tpu.core.voxelize import VoxelGenerator
    from lidarseg3d_tpu.datasets.batching import collate_segnet

    rng = np.random.default_rng(seed)
    vg = VoxelGenerator(VSZ, PCR, max_num_points=5, max_voxels=1500)
    frames, targets = [], []
    for _ in range(B):
        pts = np.stack([rng.uniform(-8, 8, 600), rng.uniform(-8, 8, 600),
                        rng.uniform(-2, 2, 600), rng.uniform(0, 1, 600)],
                       1).astype(np.float32)
        voxels, coords, npts = vg.generate(pts)
        frames.append({"voxels": voxels, "coordinates": coords,
                       "num_points_per_voxel": npts, "points": pts})
        boxes = np.array([[2.0, 3.0, 0.5, 1.6, 3.2, 1.5, 0.3]], np.float32)
        targets.append(assign_center_targets(
            boxes, np.array([0]), [[0]], grid_hw=(20, 20), voxel_size=VSZ,
            pc_range=PCR, out_factor=8, max_objs=10))
    batch = collate_segnet(frames, max_voxels=1024, max_points=600)
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}
    ex["input_shape"] = (17, 160, 160)
    # stack per-task targets over batch
    ntasks = len(targets[0])
    det_targets = []
    for t in range(ntasks):
        det_targets.append({
            k: jnp.asarray(np.stack([tb[t][k] for tb in targets]))
            for k in targets[0][t]
        })
    ex["det_targets"] = det_targets
    return ex


def test_voxelnet_forward_loss_decode():
    model = build_detector(dict(
        type="VoxelNet",
        reader=dict(type="MeanVoxelFeatureExtractor", num_input_features=4),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=4),
        neck=dict(type="RPN", layer_nums=(2, 2), ds_layer_strides=(1, 2),
                  ds_num_filters=(32, 64), us_layer_strides=(1, 2),
                  us_num_filters=(32, 32), num_input_features=256),
        bbox_head=dict(type="CenterHead", in_channels=64,
                       tasks=(dict(num_class=1, class_names=["car"]),),
                       weight=0.25, code_weights=(1.0,) * 8),
        test_cfg=dict(voxel_size=VSZ[:2], pc_range=PCR[:2],
                      out_size_factor=8, score_threshold=0.0),
    ))
    ex = make_det_example()
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)

    def loss_fn(p):
        (rets, bat), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, ex,
            train=True, mutable=["batch_stats"],
        )
        return model.loss(rets, bat)

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert g > 0 and np.isfinite(g)

    rets, bat = model.apply(variables, ex, train=False)
    dets = model.predict(rets, bat)
    assert dets["tasks"][0]["box3d"].shape[-1] == 7
    assert dets["box3d_lidar"].shape[-1] == 7
    assert np.isfinite(np.asarray(dets["box3d_lidar"])).all()


def test_velocity_targets_and_loss_roundtrip():
    """9-dim gt boxes produce 10-dim anno_box with (vx, vy) before the
    rotation (reference preprocess.py:401-405 order), and a vel-headed
    CenterHead consumes them; a vel-less head drops cols 6:8."""
    boxes = np.array([[1.0, 2.0, 0.3, 2.0, 4.0, 1.5, 0.4, 3.0, -1.0]],
                     np.float32)
    tgts = assign_center_targets(
        boxes, np.array([0]), [[0]], grid_hw=(20, 20),
        voxel_size=VSZ, pc_range=PCR, out_factor=8, max_objs=10)
    anno = tgts[0]["anno_box"]
    assert anno.shape == (10, 10)
    np.testing.assert_allclose(anno[0, 6:8], [3.0, -1.0])
    np.testing.assert_allclose(anno[0, 8:], [np.sin(0.4), np.cos(0.4)],
                               rtol=1e-6)

    from lidarseg3d_tpu.models.bbox_heads.center_head import CenterHead

    rng = np.random.default_rng(0)
    H = W = 20
    ret_vel = {
        "hm": jnp.asarray(rng.standard_normal((1, H, W, 1)), jnp.float32),
        "reg": jnp.asarray(rng.standard_normal((1, H, W, 2)), jnp.float32),
        "height": jnp.asarray(rng.standard_normal((1, H, W, 1)), jnp.float32),
        "dim": jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32),
        "rot": jnp.asarray(rng.standard_normal((1, H, W, 2)), jnp.float32),
        "vel": jnp.asarray(rng.standard_normal((1, H, W, 2)), jnp.float32),
    }
    tgt = {k: jnp.asarray(v)[None] for k, v in tgts[0].items()}
    head = CenterHead(tasks=(dict(num_class=1, class_names=["car"]),),
                      code_weights=(1.0,) * 10)
    loss, ld = head.get_loss([ret_vel], [tgt])
    assert np.isfinite(float(loss))
    # vel-less head on the same 10-dim targets: cols 6:8 dropped
    ret7 = {k: v for k, v in ret_vel.items() if k != "vel"}
    head7 = CenterHead(tasks=(dict(num_class=1, class_names=["car"]),),
                       code_weights=(1.0,) * 8)
    loss7, _ = head7.get_loss([ret7], [tgt])
    assert np.isfinite(float(loss7))

    # decode returns per-box velocity picked at the same top-k positions
    outs = CenterHead.decode([ret_vel], voxel_size=VSZ[:2], pc_range=PCR[:2],
                             out_factor=8, k=16, max_out=8)
    assert outs[0]["velocity"].shape == (1, 8, 2)
    assert np.isfinite(np.asarray(outs[0]["velocity"])).all()


def test_circle_nms_suppresses_by_center_distance():
    from lidarseg3d_tpu.ops.box_ops import circle_nms

    centers = jnp.asarray([[0.0, 0.0], [0.5, 0.0], [5.0, 5.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    # reference semantics: suppress when SQUARED distance <= thresh
    sel, valid = circle_nms(centers, scores, min_radius=1.0, max_out=3)
    sel, valid = np.asarray(sel), np.asarray(valid)
    assert sel[0] == 0 and valid[0]
    assert valid.sum() == 2 and 2 in sel[valid.astype(bool)].tolist()
    # tighter gate keeps all three
    sel2, valid2 = circle_nms(centers, scores, min_radius=0.2, max_out=3)
    assert np.asarray(valid2).sum() == 3


def test_velocity_augmentation_consistency():
    """Flips/rotation/scaling co-transform the BEV velocity columns."""
    from lidarseg3d_tpu.core import box_np_ops as bnp

    boxes = np.array([[1.0, 2.0, 0.0, 2, 4, 1.5, 0.3, 2.0, 1.0]], np.float32)
    pts = np.zeros((4, 4), np.float32)

    b, _ = bnp.random_flip_both(boxes, pts, rng=FlipXThenNo())
    np.testing.assert_allclose(b[0, 7:9], [2.0, -1.0])

    class RotRng:
        def uniform(self, a, b):
            return np.pi / 2

    b, _ = bnp.global_rotation(boxes, pts, [np.pi / 2, np.pi / 2], RotRng())
    np.testing.assert_allclose(b[0, 7:9], [-1.0, 2.0], atol=1e-6)

    class ScaleRng:
        def uniform(self, a, b):
            return 2.0

    b, _ = bnp.global_scaling(boxes, pts, 2.0, 2.0, ScaleRng())
    np.testing.assert_allclose(b[0, 7:9], [4.0, 2.0])


class FlipXThenNo:
    def __init__(self):
        self.calls = 0

    def random(self):
        self.calls += 1
        return 0.1 if self.calls == 1 else 0.9


def test_double_flip_merge_recovers_original_decode():
    """Four CONSISTENT flip variants (what the network would output on the
    flipped point clouds) must merge back to exactly the single-frame
    prediction: decode(variants, double_flip=True) == decode(original).
    Pins the un-flip axes, the reg 1-offset fixes, the rot sign fixes and
    the velocity sign fixes (test_aug.py + reference center_head.py:301-380).
    """
    from lidarseg3d_tpu.models.bbox_heads.center_head import CenterHead

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 16, 24, 3

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    ret0 = {
        "hm": r(B, H, W, C), "reg": rng.uniform(0, 1, (B, H, W, 2)).astype(
            np.float32),
        "height": r(B, H, W, 1), "dim": r(B, H, W, 3) * 0.1,
        "rot": r(B, H, W, 2), "vel": r(B, H, W, 2),
    }

    def fH(t):
        return t[:, ::-1]

    def fW(t):
        return t[:, :, ::-1]

    def variant_y(d):  # network output on y=-y input
        out = {k: fH(v).copy() for k, v in d.items()}
        out["reg"][..., 1] = 1.0 - out["reg"][..., 1]
        out["rot"][..., 1] = -out["rot"][..., 1]  # cos flips
        out["vel"][..., 1] = -out["vel"][..., 1]
        return out

    def variant_x(d):  # network output on x=-x input
        out = {k: fW(v).copy() for k, v in d.items()}
        out["reg"][..., 0] = 1.0 - out["reg"][..., 0]
        out["rot"][..., 0] = -out["rot"][..., 0]  # sin flips
        out["vel"][..., 0] = -out["vel"][..., 0]
        return out

    v0, v1, v2, v3 = ret0, variant_y(ret0), variant_x(ret0), variant_x(
        variant_y(ret0))
    stacked = {
        k: jnp.asarray(np.stack([v0[k], v1[k], v2[k], v3[k]], axis=1)
                       .reshape(B * 4, H, W, v0[k].shape[-1]))
        for k in ret0
    }

    kw = dict(voxel_size=(0.2, 0.2), pc_range=(-10.0, -10.0), out_factor=4,
              k=20, score_threshold=0.05, nms_iou=0.7, max_out=10)
    ref = CenterHead.decode([{k: jnp.asarray(v) for k, v in ret0.items()}],
                            **kw)[0]
    got = CenterHead.decode([stacked], double_flip=True, **kw)[0]
    for key in ("box3d", "scores", "labels", "valid", "velocity"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=1e-5,
                                   atol=1e-5, err_msg=key)


def test_double_flip_pipeline_emits_four_variant_frames():
    """DoubleFlip -> SegVoxelization -> DetReformat yields 4 consecutive
    frames whose points are the (orig, y-, x-, xy-) flips."""
    from lidarseg3d_tpu.datasets.pipelines.det_pipeline import (
        DetReformat, DoubleFlip)
    from lidarseg3d_tpu.datasets.pipelines.seg_preprocess import (
        SegVoxelization)

    rng = np.random.default_rng(3)
    pts = rng.uniform(-4, 4, (500, 5)).astype(np.float32)
    sample = {"points": pts, "mode": "val",
              "metadata": {"token": "t0"}}
    info = {}
    sample, info = DoubleFlip()(sample, info)
    vox = SegVoxelization(cfg=dict(
        range=[-5, -5, -2, 5, 5, 2], voxel_size=[0.5, 0.5, 0.5],
        max_points_in_voxel=5, max_voxel_num=2000))
    sample, info = vox(sample, info)
    frames, info = DetReformat()(sample, info)
    assert isinstance(frames, list) and len(frames) == 4
    np.testing.assert_allclose(frames[1]["points"][:, 1], -pts[:, 1])
    np.testing.assert_allclose(frames[2]["points"][:, 0], -pts[:, 0])
    np.testing.assert_allclose(frames[3]["points"][:, :2], -pts[:, :2])
    for fr in frames:
        assert fr["voxels"].shape[0] > 0
        assert fr["metadata"]["token"] == "t0"
