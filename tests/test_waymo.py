"""SemanticWaymo dataset over synthetic pkl frames."""

import os
import pickle

import numpy as np

from lidarseg3d_tpu.datasets import build_dataset


def write_fixture(root, frames=2, n_top=900, n_other=300, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "training_frames"), exist_ok=True)
    infos = []
    for i in range(frames):
        n = n_top + n_other
        xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
        feat = rng.uniform(0, 1, (n, 2)).astype(np.float32)
        cp = np.full((n, 3), -100.0, np.float32)
        vis = rng.random(n) < 0.5
        cp[vis, 0] = rng.integers(1, 6, vis.sum())
        cp[vis, 1] = rng.uniform(0, 1920, vis.sum())
        cp[vis, 2] = rng.uniform(0, 1280, vis.sum())
        labels = rng.integers(0, 23, n_top).astype(np.uint8)
        obj = {
            "token": f"seg{i}",
            "lidars": {"points_xyz": xyz, "points_feature": feat,
                       "points_cp": cp},
            "annotations": {"point_sem_labels": labels,
                            "num_seg_points": n_top},
            "cam_paths": {},
        }
        path = os.path.join(root, "training_frames", f"seg{i}.pkl")
        with open(path, "wb") as f:
            pickle.dump(obj, f)
        infos.append({"token": f"seg{i}", "path": path})
    info_path = os.path.join(root, "infos_training_01sweeps_segdet.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return info_path


def make_pipeline(train=True):
    pcr = [-35.0, -35.0, -2.0, 35.0, 35.0, 4.0]
    vsz = [0.5, 0.5, 0.5]
    pipe = [dict(type="LoadPointCloudFromFile",
                 dataset="SemanticWaymoDataset")]
    if train:
        pipe.append(dict(type="LoadPointCloudAnnotations"))
    pipe.append(dict(type="SegPreprocess", cfg=dict(
        mode="train" if train else "val", shuffle_points=train, npoints=1100,
        global_rot_noise=[-0.5, 0.5], global_scale_noise=[0.95, 1.05],
        global_translate_std=0.2)))
    pipe.append(dict(type="SegVoxelization", cfg=dict(
        range=pcr, voxel_size=vsz, max_points_in_voxel=5,
        max_voxel_num=[2000, 2000])))
    if train:
        pipe.append(dict(type="SegAssignLabel",
                         cfg=dict(voxel_label_enc="compact_value")))
    pipe.append(dict(type="Reformat"))
    return pipe


def test_waymo_dataset_train(tmp_path):
    info_path = write_fixture(str(tmp_path))
    ds = build_dataset(dict(
        type="SemanticWaymoDataset", info_path=info_path,
        root_path=str(tmp_path), pipeline=make_pipeline(True),
    ))
    assert len(ds) == 2
    fr = ds.get_sensor_data(0, rng=np.random.default_rng(0))
    assert fr["points"].shape[1] == 5
    assert (fr["point_sem_labels"] < 23).all()


def test_waymo_eval(tmp_path):
    info_path = write_fixture(str(tmp_path))
    ds = build_dataset(dict(
        type="SemanticWaymoDataset", info_path=info_path,
        root_path=str(tmp_path), pipeline=make_pipeline(False),
        test_mode=True,
    ))
    dets = {}
    for i in ds._infos:
        anno = ds.get_anno_for_eval(i["token"])
        full = np.concatenate([
            anno["point_sem_labels"],
            np.zeros(300, np.uint8),
        ])
        dets[i["token"]] = {"pred_point_sem_labels": full}
    res, _ = ds.evaluation(dets)
    assert res["results"]["mIoU"] > 99.9


def test_label_range_image_roundtrip():
    """Scattering per-point labels into the [64, 2650, 2] label range image
    places class ids at exactly the stored (col, row) cells (the TF-free
    part of the submission writer; proto packing itself is gated on
    waymo_open_dataset)."""
    from lidarseg3d_tpu.datasets.waymo.submission import (
        _label_range_image, TOP_LIDAR_ROW_NUM, TOP_LIDAR_COL_NUM,
    )
    rng = np.random.default_rng(0)
    n = 500
    cells = rng.choice(TOP_LIDAR_ROW_NUM * TOP_LIDAR_COL_NUM, n, replace=False)
    rows, cols = cells // TOP_LIDAR_COL_NUM, cells % TOP_LIDAR_COL_NUM
    indexing = np.stack([cols, rows], -1).astype(np.int32)
    labels = rng.integers(1, 23, n).astype(np.int32)
    ri = _label_range_image(indexing, labels)
    assert ri.shape == (TOP_LIDAR_ROW_NUM, TOP_LIDAR_COL_NUM, 2)
    np.testing.assert_array_equal(ri[rows, cols, 1], labels)
    assert ri[..., 0].sum() == 0
    assert (ri[..., 1] != 0).sum() == n


def test_top_slices_select_top_lidar_points():
    """top_slices reconstruct the TOP ri1/ri2 label segments from the flat
    converter point order (ri1 all-lidars TOP-first, then ri2)."""
    n_top1, n_oth1, n_top2, n_oth2 = 40, 25, 15, 10
    sl = {"ri1": [0, n_top1], "ri2": [n_top1 + n_oth1, n_top2]}
    flat = np.concatenate([
        np.full(n_top1, 1), np.full(n_oth1, 9),
        np.full(n_top2, 2), np.full(n_oth2, 9),
    ])
    ri1 = flat[sl["ri1"][0]: sl["ri1"][0] + sl["ri1"][1]]
    ri2 = flat[sl["ri2"][0]: sl["ri2"][0] + sl["ri2"][1]]
    assert (ri1 == 1).all() and len(ri1) == n_top1
    assert (ri2 == 2).all() and len(ri2) == n_top2


def test_waymo_two_sweep_loading(tmp_path):
    """nsweeps=2: the previous same-context frame's points are transformed
    into the key frame's vehicle coords with a time-lag channel (reference
    waymo two_sweeps_with_velo recipe)."""
    from lidarseg3d_tpu.datasets.pipelines.loading import (
        LoadPointCloudFromFile,
    )

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "f"), exist_ok=True)
    rng = np.random.default_rng(0)
    objs, paths = [], []
    for i in range(2):
        xyz = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
        obj = {"token": f"s{i}", "lidars": {
            "points_xyz": xyz,
            "points_feature": rng.uniform(0, 1, (50, 2)).astype(np.float32),
            "points_cp": np.full((50, 3), -100.0, np.float32)}}
        p = os.path.join(root, "f", f"s{i}.pkl")
        with open(p, "wb") as f:
            pickle.dump(obj, f)
        objs.append(obj)
        paths.append(p)

    # sweep 0 -> key frame 1: translate by (1, 2, 0)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, 2.0, 0.0]
    info = {"token": "s1", "path": paths[1],
            "sweeps": [{"path": paths[0], "sweep_to_ref": T,
                        "time_lag": 0.1}]}
    loader = LoadPointCloudFromFile(dataset="SemanticWaymoDataset")
    sample, _ = loader({"type": None, "nsweeps": 2}, info)
    pts = sample["points"]
    assert pts.shape == (100, 6)  # xyz + 2 feats + dt
    np.testing.assert_allclose(pts[:50, 5], 0.0)
    np.testing.assert_allclose(pts[50:, 5], 0.1, rtol=1e-6)
    np.testing.assert_allclose(
        pts[50:, :3], objs[0]["lidars"]["points_xyz"] + [1.0, 2.0, 0.0],
        rtol=1e-5)


def test_simple_inference_waymo_tool(tmp_path):
    """tools/simple_inference_waymo.py end to end on a synthetic converted
    frame pkl + a freshly-initialized checkpoint (reference parity:
    /root/reference/tools/simple_inference_waymo.py, sans open3d window)."""
    import pickle
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from lidarseg3d_tpu.utils.config import Config
    from lidarseg3d_tpu.models import build_detector
    from lidarseg3d_tpu.apis.train import save_checkpoint
    from lidarseg3d_tpu.core.voxelize import VoxelGenerator
    from lidarseg3d_tpu.datasets.batching import collate_segnet

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(repo, "configs", "tests",
                                       "mini_waymo_voxelnet.py"))

    rng = np.random.default_rng(5)
    n = 3000
    pts = np.concatenate([
        rng.uniform(-9, 9, (n, 2)), rng.uniform(-1.5, 3.5, (n, 1)),
        rng.uniform(0, 1, (n, 2)),
    ], axis=1).astype(np.float32)
    frame_pkl = tmp_path / "frame0.pkl"
    with open(frame_pkl, "wb") as f:
        pickle.dump({"lidars": {"points_xyz": pts[:, :3],
                                "points_feature": pts[:, 3:]}}, f)

    # init a checkpoint the tool can load
    vg_cfg = cfg.voxel_generator
    vg = VoxelGenerator(vg_cfg["voxel_size"], vg_cfg["range"],
                        vg_cfg["max_points_in_voxel"],
                        vg_cfg["max_voxel_num"][1])
    voxels, coords, npts = vg.generate(pts)
    batch = collate_segnet([{
        "voxels": voxels, "coordinates": coords,
        "num_points_per_voxel": npts, "points": pts, "metadata": {},
    }], cfg.capacity["max_voxels"], cfg.capacity["max_points"])
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}
    grid = vg.grid_size
    ex["input_shape"] = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
    model = build_detector(cfg.model.to_dict(), test_cfg=cfg.get("test_cfg"))
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)
    work = tmp_path / "work"
    save_checkpoint(str(work), {
        "step": jnp.zeros((), jnp.int32), "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }, epoch=1)

    out_pkl = tmp_path / "dets.pkl"
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "simple_inference_waymo.py"),
         os.path.join(repo, "configs", "tests", "mini_waymo_voxelnet.py"),
         "--checkpoint", str(work), "--frame", str(frame_pkl),
         "--out", str(out_pkl), "--device", "cpu"],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "detections:" in proc.stdout
    with open(out_pkl, "rb") as f:
        dets = pickle.load(f)
    assert dets["box3d_lidar"].shape[-1] == 7
