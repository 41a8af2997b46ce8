"""Panoptic instance tooling: save_instance extraction + paste augmentation
(VERDICT round-1 item 9; reference semantickitti.py:315-366 +
tools/instance_preprocess.py)."""

import os
import pickle

import numpy as np

from lidarseg3d_tpu.datasets.semantickitti import metadata as meta
from lidarseg3d_tpu.datasets.semantickitti.dataset import SemanticKITTIDataset
from lidarseg3d_tpu.datasets.pipelines.instance_aug import SegInstanceAug

from tests.test_train_integration import write_fixture


def write_instance_fixture(root, n_inst=3, pts_per=40, seed=1):
    """One frame whose label file contains n_inst clean car instances."""
    rng = np.random.default_rng(seed)
    vd = os.path.join(root, "00", "velodyne")
    ld = os.path.join(root, "00", "labels")
    os.makedirs(vd, exist_ok=True)
    os.makedirs(ld, exist_ok=True)
    pts, sem, inst = [], [], []
    for i in range(n_inst):
        center = rng.uniform(-5, 5, 3)
        p = center + rng.normal(0, 0.3, (pts_per, 3))
        pts.append(np.concatenate([p, rng.uniform(0, 1, (pts_per, 1))], 1))
        sem.append(np.full(pts_per, 10, np.uint32))  # raw id 10 = car
        inst.append(np.full(pts_per, i + 1, np.uint32))
    # background (road, raw id 40), below min_points per-instance rule
    bg = rng.uniform(-6, 6, (200, 4))
    pts.append(bg)
    sem.append(np.full(200, 40, np.uint32))
    inst.append(np.zeros(200, np.uint32))
    pts = np.concatenate(pts).astype(np.float32)
    lab = (np.concatenate(sem) | (np.concatenate(inst) << 16)).astype(
        np.uint32)
    pts.tofile(os.path.join(vd, "000000.bin"))
    lab.tofile(os.path.join(ld, "000000.label"))


def test_save_instance_and_paste(tmp_path):
    root = str(tmp_path / "sequences")
    write_instance_fixture(root)
    ds = SemanticKITTIDataset(root_path=root, sequences=("00",))
    out = str(tmp_path / "out")
    pkl = ds.save_instance(out, min_points=10)

    with open(pkl, "rb") as f:
        lib = pickle.load(f)
    car_cls = meta.LEARNING_MAP[10]
    assert len(lib[car_cls]) == 3  # three cars above min_points
    # every stored instance has [n, 4] float32 points
    for p in lib[car_cls]:
        arr = np.fromfile(p, np.float32).reshape(-1, 4)
        assert arr.shape[0] >= 10
    # the road background must not appear as an instance
    assert all(len(v) == 0 for c, v in lib.items() if c != car_cls)

    # paste augmentation: point/label counts grow consistently, pasted
    # labels carry the thing class, ranges are preserved by z-rotation
    aug = SegInstanceAug(cfg=dict(instance_pkl=pkl, max_instances=5))
    rng = np.random.default_rng(0)
    n0 = 500
    sample = {
        "points": rng.uniform(-6, 6, (n0, 4)).astype(np.float32),
        "annotations": {
            "point_sem_labels": np.zeros(n0, np.int32),
            "point_inst_labels": np.zeros(n0, np.uint32),
        },
        "rng": np.random.default_rng(3),
        "mode": "train",
    }
    out_sample, _ = aug(sample, {})
    pts = out_sample["points"]
    lab = out_sample["annotations"]["point_sem_labels"]
    assert pts.shape[0] == lab.shape[0]
    assert pts.shape[0] > n0  # rng(3) pastes at least one instance
    assert (lab[n0:] == car_cls).all()
    r_orig = np.linalg.norm(
        np.fromfile(lib[car_cls][0], np.float32).reshape(-1, 4)[:, :2],
        axis=1)
    # some pasted instance preserves its range profile (rotation about z)
    r_new = np.linalg.norm(pts[n0:, :2], axis=1)
    assert abs(np.sort(r_new)[:len(r_orig)].mean()
               - np.sort(r_orig).mean()) < 5.0
