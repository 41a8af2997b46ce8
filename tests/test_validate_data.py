"""Raw-dataset tree validation (tools/create_data.py --dry-data).

Builds tiny synthetic trees in the expected layouts and checks both the
pass path and the actionable failure messages (VERDICT r4 item 10).
"""

import json
import os
import os.path as osp

import numpy as np
import pytest

from lidarseg3d_tpu.datasets import validate as dv
from lidarseg3d_tpu.datasets.nuscenes.common import NuScenesTables
from lidarseg3d_tpu.datasets.semantickitti import metadata as kitti_meta


def write_kitti(root, n=50, seqs=("00",), labels=True, img=False):
    raw_ids = [r for r in kitti_meta.LEARNING_MAP if r != 0][:5]
    for seq in seqs:
        os.makedirs(osp.join(root, seq, "velodyne"), exist_ok=True)
        if labels:
            os.makedirs(osp.join(root, seq, "labels"), exist_ok=True)
        for i in range(2):
            pts = np.random.rand(n, 4).astype(np.float32)
            pts.tofile(osp.join(root, seq, "velodyne", f"{i:06d}.bin"))
            if labels:
                lab = np.random.choice(raw_ids, n).astype(np.uint32)
                (lab | np.uint32(7 << 16)).tofile(
                    osp.join(root, seq, "labels", f"{i:06d}.label"))
        if img:
            os.makedirs(osp.join(root, seq, "image_2"), exist_ok=True)
            with open(osp.join(root, seq, "image_2", "000000.png"), "wb") as f:
                f.write(b"x")
            with open(osp.join(root, seq, "calib.txt"), "w") as f:
                f.write("P2: 1 0 0 0 0 1 0 0 0 0 1 0\n"
                        "Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")


def test_kitti_ok(tmp_path):
    write_kitti(str(tmp_path), img=True)
    rep = dv.validate_semantickitti(str(tmp_path), use_img=True)
    assert rep["sequences"] == 1 and rep["frames"] == 2


def test_kitti_label_count_mismatch(tmp_path):
    write_kitti(str(tmp_path))
    bad = osp.join(str(tmp_path), "00", "labels", "000000.label")
    np.zeros(7, np.uint32).tofile(bad)
    with pytest.raises(dv.DataTreeError, match="labels != 50 points"):
        dv.validate_semantickitti(str(tmp_path))


def test_kitti_bad_bit_layout(tmp_path):
    write_kitti(str(tmp_path), n=20)
    # semantic id written in the UPPER 16 bits (the classic mistake):
    # lower 16 bits decode to raw id 0 everywhere
    for i in range(2):
        bad = osp.join(str(tmp_path), "00", "labels", f"{i:06d}.label")
        (np.full(20, 10, np.uint32) << 16).tofile(bad)
    with pytest.raises(dv.DataTreeError, match="bit-layout"):
        dv.validate_semantickitti(str(tmp_path))


def test_kitti_unknown_raw_id(tmp_path):
    write_kitti(str(tmp_path), n=20)
    bad = osp.join(str(tmp_path), "00", "labels", "000000.label")
    np.full(20, 12345, np.uint32).tofile(bad)  # not a semantic-kitti id
    with pytest.raises(dv.DataTreeError, match="not in\\s+LEARNING_MAP|not in"):
        dv.validate_semantickitti(str(tmp_path))


def test_kitti_missing_calib(tmp_path):
    write_kitti(str(tmp_path), img=True)
    os.remove(osp.join(str(tmp_path), "00", "calib.txt"))
    with pytest.raises(dv.DataTreeError, match="calib.txt"):
        dv.validate_semantickitti(str(tmp_path), use_img=True)


def write_nusc(root, version="v1.0-mini", npts=40):
    vdir = osp.join(root, version)
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(osp.join(root, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(osp.join(root, "lidarseg", version), exist_ok=True)
    pfile = "samples/LIDAR_TOP/scan0.pcd.bin"
    np.random.rand(npts, 5).astype(np.float32).tofile(osp.join(root, pfile))
    lfile = f"lidarseg/{version}/tok0_lidarseg.bin"
    np.random.randint(0, 31, npts, dtype=np.uint8).tofile(
        osp.join(root, lfile))
    tables = {t: [] for t in NuScenesTables.TABLES}
    tables["lidarseg"] = [
        {"token": "seg0", "sample_data_token": "sd0", "filename": lfile}]
    tables["sample_data"] = [{"token": "sd0", "filename": pfile}]
    for t, rows in tables.items():
        with open(osp.join(vdir, f"{t}.json"), "w") as f:
            json.dump(rows, f)


def test_nusc_ok(tmp_path):
    write_nusc(str(tmp_path))
    rep = dv.validate_semanticnusc(str(tmp_path), version="v1.0-mini")
    assert rep["checked"] == 1


def test_nusc_label_scan_mismatch(tmp_path):
    write_nusc(str(tmp_path), npts=40)
    np.zeros(39, np.uint8).tofile(
        osp.join(str(tmp_path), "lidarseg/v1.0-mini/tok0_lidarseg.bin"))
    with pytest.raises(dv.DataTreeError, match="39 uint8 labels != 40"):
        dv.validate_semanticnusc(str(tmp_path), version="v1.0-mini")


def test_nusc_missing_table(tmp_path):
    write_nusc(str(tmp_path))
    os.remove(osp.join(str(tmp_path), "v1.0-mini", "sample.json"))
    with pytest.raises(dv.DataTreeError, match="sample.json"):
        dv.validate_semanticnusc(str(tmp_path), version="v1.0-mini")


def test_waymo_ok_and_empty(tmp_path):
    sdir = osp.join(str(tmp_path), "training")
    os.makedirs(sdir)
    with pytest.raises(dv.DataTreeError, match="no \\*.tfrecord"):
        dv.validate_semanticwaymo(str(tmp_path))
    with open(osp.join(sdir, "segment-1.tfrecord"), "wb") as f:
        f.write(b"data")
    assert dv.validate_semanticwaymo(str(tmp_path))["tfrecords"] == 1
    with open(osp.join(sdir, "segment-2.tfrecord"), "wb"):
        pass
    with pytest.raises(dv.DataTreeError, match="empty tfrecords"):
        dv.validate_semanticwaymo(str(tmp_path))
