"""nuScenes detection family: config build, velocity-headed VoxelNet
train-step/decode fixture, gt-box extraction, submission JSON writer."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.models import build_detector

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PCR = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
VSZ = [0.1, 0.1, 0.25]


@pytest.mark.parametrize("name", [
    "nusc_centerpoint_voxelnet_01voxel.py",
    "nusc_centerpoint_voxelnet_01voxel_circle_nms.py",
])
def test_nusc_det_configs_build(name):
    from lidarseg3d_tpu.utils.config import Config

    cfg = Config.fromfile(
        os.path.join(REPO, "configs", "nusc", "voxelnet", name))
    model = build_detector(
        cfg.model.to_dict() if hasattr(cfg.model, "to_dict")
        else dict(cfg.model),
        train_cfg=cfg.get("train_cfg"), test_cfg=cfg.get("test_cfg"))
    heads = dict(cfg.model["bbox_head"]["common_heads"])
    assert "vel" in heads
    assert len(cfg.model["bbox_head"]["code_weights"]) == 10
    assert model is not None


def nusc_like_tiny_cfg():
    """VoxelNet with velocity heads at test scale (nusc semantics)."""
    return dict(
        type="VoxelNet",
        reader=dict(type="MeanVoxelFeatureExtractor", num_input_features=4),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=4),
        neck=dict(type="RPN", layer_nums=(2, 2), ds_layer_strides=(1, 2),
                  ds_num_filters=(32, 64), us_layer_strides=(1, 2),
                  us_num_filters=(32, 32), num_input_features=256),
        bbox_head=dict(
            type="CenterHead", in_channels=64,
            tasks=(dict(num_class=1, class_names=["car"]),
                   dict(num_class=1, class_names=["pedestrian"])),
            dataset="nuscenes", weight=0.25,
            code_weights=(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0),
            common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                          "rot": (2, 2), "vel": (2, 2)},
        ),
        test_cfg=dict(voxel_size=VSZ[:2], pc_range=PCR[:2],
                      out_size_factor=8, score_threshold=0.0,
                      circular_nms=True, min_radius=[4, 0.5], max_out=16),
    )


def make_example(B=2, seed=0):
    from lidarseg3d_tpu.core.center_targets import assign_center_targets
    from lidarseg3d_tpu.core.voxelize import VoxelGenerator
    from lidarseg3d_tpu.datasets.batching import collate_segnet

    rng = np.random.default_rng(seed)
    vg = VoxelGenerator(VSZ, PCR, max_num_points=5, max_voxels=1500)
    frames = []
    for _ in range(B):
        pts = np.stack([rng.uniform(-8, 8, 800), rng.uniform(-8, 8, 800),
                        rng.uniform(-2, 2, 800), rng.uniform(0, 1, 800)],
                       1).astype(np.float32)
        voxels, coords, npts = vg.generate(pts)
        boxes = np.array([[1.0, 2.0, 0.0, 2.0, 4.0, 1.5, 0.3, 3.0, -1.0],
                          [-3.0, -2.0, 0.0, 0.6, 0.6, 1.7, 0.0, 0.5, 0.2]],
                         np.float32)
        tgts = assign_center_targets(
            boxes, np.array([0, 1]), [[0], [1]], grid_hw=(20, 20),
            voxel_size=VSZ, pc_range=PCR, out_factor=8, max_objs=10)
        frames.append({
            "voxels": voxels, "coordinates": coords,
            "num_points_per_voxel": npts, "points": pts,
            "det_targets": tgts,
        })
    batch = collate_segnet(frames, max_voxels=1500, max_points=800)
    ex = {k: jnp.asarray(v) for k, v in batch.items()
          if k != "metadata" and not k.startswith("det_")}
    tasks = []
    for ti in range(2):
        tasks.append({
            k: jnp.asarray(np.stack([f["det_targets"][ti][k]
                                     for f in frames]))
            for k in frames[0]["det_targets"][ti]
        })
    ex["det_targets"] = tasks
    grid = np.round((np.asarray(PCR[3:]) - np.asarray(PCR[:3]))
                    / np.asarray(VSZ)).astype(int)
    ex["input_shape"] = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
    return ex


def test_velocity_voxelnet_train_step_and_decode():
    model = build_detector(nusc_like_tiny_cfg())
    ex = make_example()
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)

    def loss_fn(params):
        v = {"params": params,
             "batch_stats": variables.get("batch_stats", {})}
        (rets, bat), _ = model.apply(v, ex, train=True,
                                     mutable=["batch_stats"])
        loss, ld = model.loss(rets, bat)
        return loss, ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert g > 0 and np.isfinite(g)

    rets, bat = model.apply(variables, ex, train=False)
    out = model.predict(rets, bat)  # circle NMS via test_cfg
    assert out["box3d_lidar"].shape[-1] == 7
    assert out["velocity"].shape == out["box3d_lidar"].shape[:2] + (2,)
    assert np.isfinite(np.asarray(out["velocity"])).all()


class _FakeTables:
    """Duck-typed NuScenesTables for _sample_gt_boxes."""

    def __init__(self):
        t0, t1, t2 = 0.0, 0.5, 1.0
        self.samples = {
            f"s{i}": {"token": f"s{i}", "timestamp": t * 1e6}
            for i, t in enumerate((t0, t1, t2))
        }
        mk = lambda i, x: {
            "token": f"a{i}", "sample_token": f"s{i}",
            "instance_token": "inst0",
            "translation": [x, 0.0, 1.0], "size": [2.0, 4.0, 1.5],
            "rotation": [1.0, 0.0, 0.0, 0.0],
            "prev": f"a{i-1}" if i > 0 else "",
            "next": f"a{i+1}" if i < 2 else "",
            "num_lidar_pts": 10, "num_radar_pts": 0,
        }
        self.anns = {f"a{i}": mk(i, float(i)) for i in range(3)}
        self.anns_by_sample = {
            f"s{i}": [self.anns[f"a{i}"]] for i in range(3)
        }

    def get(self, table, token):
        if table == "sample_annotation":
            return self.anns[token]
        if table == "sample":
            return self.samples[token]
        if table == "instance":
            return {"category_token": "cat0"}
        if table == "category":
            return {"name": "vehicle.car"}
        raise KeyError(table)


def test_nusc_gt_box_extraction_velocity_and_frame():
    from lidarseg3d_tpu.datasets.nuscenes.common import _sample_gt_boxes

    ts = _FakeTables()
    # lidar frame rotated 90deg about z and translated
    th = np.pi / 2
    ref_to_global = np.eye(4)
    ref_to_global[:2, :2] = [[np.cos(th), -np.sin(th)],
                             [np.sin(th), np.cos(th)]]
    ref_to_global[:3, 3] = [10.0, 0.0, 0.0]
    boxes, names = _sample_gt_boxes(ts, ts.samples["s1"], ref_to_global)
    assert names.tolist() == ["car"] and boxes.shape == (1, 9)
    # global center (1, 0, 1) -> lidar frame
    g2r = np.linalg.inv(ref_to_global)
    want_c = g2r[:3, :3] @ np.array([1.0, 0.0, 1.0]) + g2r[:3, 3]
    np.testing.assert_allclose(boxes[0, :3], want_c, atol=1e-6)
    # dims: nusc size [w, l, h] -> our [l, w, h]
    np.testing.assert_allclose(boxes[0, 3:6], [4.0, 2.0, 1.5])
    # velocity: centered diff = (2-0)/(1-0) = 2 m/s along global x,
    # rotated into the lidar frame
    want_v = (g2r[:3, :3] @ np.array([2.0, 0.0, 0.0]))[:2]
    np.testing.assert_allclose(boxes[0, 7:9], want_v, atol=1e-6)


def test_nusc_det_submission_json(tmp_path):
    from lidarseg3d_tpu.datasets.nuscenes.det_submission import (
        detections_to_nusc_json,
    )

    th = np.pi / 2
    T = np.eye(4, dtype=np.float32)
    T[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    T[:3, 3] = [100.0, 50.0, 1.0]
    infos = {"tok0": {"ref_to_global": T}}
    dets = {"tok0": {
        "box3d_lidar": np.array([[1.0, 0.0, 0.5, 4.0, 2.0, 1.5, 0.0]]),
        "scores": np.array([0.9]),
        "label_preds": np.array([0]),  # car
        "velocity": np.array([[3.0, 0.0]]),
        "valid": np.array([True]),
    }}
    path = detections_to_nusc_json(dets, infos, str(tmp_path / "res.json"))
    with open(path) as f:
        res = json.load(f)
    box = res["results"]["tok0"][0]
    np.testing.assert_allclose(box["translation"], [100.0, 51.0, 1.5],
                               atol=1e-5)
    np.testing.assert_allclose(box["size"], [2.0, 4.0, 1.5])  # w, l, h
    np.testing.assert_allclose(box["velocity"], [0.0, 3.0], atol=1e-6)
    assert box["detection_name"] == "car"
    assert box["attribute_name"] == "vehicle.moving"  # |v| > 0.2
    # quaternion encodes yaw + frame rotation (pi/2)
    w, x, y, z = box["rotation"]
    np.testing.assert_allclose(2 * np.arctan2(z, w), th, atol=1e-6)
    assert res["meta"]["use_lidar"] is True


def test_run_det_eval_loop():
    """apis/det_eval.run_det_eval: jitted decode over a loader, per-token
    box dicts with velocity, ready for the submission writers."""
    from lidarseg3d_tpu.apis.det_eval import run_det_eval
    from lidarseg3d_tpu.apis.train import TrainState

    model = build_detector(nusc_like_tiny_cfg())
    ex = make_example(B=2)
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=())

    host = {k: np.asarray(v) for k, v in ex.items()
            if k not in ("input_shape", "det_targets")}
    host["metadata"] = [{"token": "t0"}, {"token": "t1"}]

    class OneBatchLoader:
        def epoch(self, e):
            yield dict(host)

    dets = run_det_eval(model, state, OneBatchLoader(), ex["input_shape"],
                        test_cfg=dict(model.test_cfg))
    assert set(dets) == {"t0", "t1"}
    d = dets["t0"]
    assert d["box3d_lidar"].shape[-1] == 7
    assert d["velocity"].shape == d["box3d_lidar"].shape[:1] + (2,)
    assert d["scores"].shape == d["valid"].shape
