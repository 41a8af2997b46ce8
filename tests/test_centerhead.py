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
