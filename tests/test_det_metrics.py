"""Devkit-free detection metrics (core/det_metrics.py)."""

import numpy as np

from lidarseg3d_tpu.core.det_metrics import (
    waymo_ap, nusc_map, group_detections_by_class, _ap_from_matches,
)


def box(x, y, yaw=0.0, l=4.0, w=2.0):
    return [x, y, 0.0, l, w, 1.5, yaw]


def test_perfect_detections_score_1():
    gt = np.array([box(0, 0), box(10, 0)])
    det = gt.copy()
    frames = {"VEHICLE": [(det, np.array([0.9, 0.8]), gt)]}
    res = waymo_ap(frames)
    assert abs(res["VEHICLE"]["AP"] - 1.0) < 1e-6
    assert abs(res["VEHICLE"]["APH"] - 1.0) < 1e-6
    res2 = nusc_map({"car": [(det, np.array([0.9, 0.8]), gt)]})
    assert abs(res2["car"]["AP"] - 1.0) < 1e-6


def test_false_positive_lowers_precision_tail():
    gt = np.array([box(0, 0)])
    det = np.array([box(0, 0), box(50, 50)])  # second is a FP
    frames = {"VEHICLE": [(det, np.array([0.9, 0.8]), gt)]}
    res = waymo_ap(frames)
    # recall 1 reached at precision 1 before the FP: AP stays 1
    assert abs(res["VEHICLE"]["AP"] - 1.0) < 1e-6
    # higher-scored FP degrades AP
    frames = {"VEHICLE": [(det, np.array([0.8, 0.9]), gt)]}
    res = waymo_ap(frames)
    assert res["VEHICLE"]["AP"] < 1.0


def test_missed_gt_caps_recall():
    gt = np.array([box(0, 0), box(20, 0)])
    det = np.array([box(0, 0)])
    frames = {"VEHICLE": [(det, np.array([0.9]), gt)]}
    res = waymo_ap(frames)
    assert 0.45 < res["VEHICLE"]["AP"] < 0.55  # recall caps at 0.5


def test_aph_penalizes_heading_error():
    gt = np.array([box(0, 0, yaw=0.0)])
    det = np.array([box(0, 0, yaw=np.pi / 2)])  # 90 deg off, IoU-matched?
    # a square box keeps BEV IoU 1 under 90deg rotation
    det[0][3] = det[0][4] = gt[0][3] = gt[0][4] = 2.0
    frames = {"VEHICLE": [(det, np.array([0.9]), gt)]}
    res = waymo_ap(frames)
    assert abs(res["VEHICLE"]["AP"] - 1.0) < 1e-6
    # 1 - (pi/2)/pi = 0.5, up to the 101-point recall quantization
    assert abs(res["VEHICLE"]["APH"] - 0.5) < 0.01


def test_nusc_distance_gates():
    gt = np.array([box(0, 0)])
    det = np.array([box(1.5, 0)])  # inside gates 2 and 4, outside 0.5 and 1
    frames = {"car": [(det, np.array([0.9]), gt)]}
    res = nusc_map(frames)
    assert abs(res["car"]["AP"] - 0.5) < 1e-6


def test_group_detections_by_class():
    dets = {"t0": {
        "box3d_lidar": np.array([box(0, 0), box(5, 5)]),
        "scores": np.array([0.9, 0.7]),
        "label_preds": np.array([0, 1]),
        "valid": np.array([True, True]),
    }}
    gts = {"t0": (np.array([box(0, 0), box(5, 5)]),
                  np.array(["VEHICLE", "PEDESTRIAN"], dtype=object))}
    frames = group_detections_by_class(dets, gts,
                                       ["VEHICLE", "PEDESTRIAN"])
    res = waymo_ap(frames)
    assert abs(res["mAP"] - 1.0) < 1e-6


def test_ap_interpolation_monotone():
    # 3 dets: TP, FP, TP over 2 gts -> precision dips then recovers;
    # the envelope must use the max precision at each recall
    is_tp = np.array([True, False, True])
    ap = _ap_from_matches(is_tp, np.ones(3), n_gt=2)
    # envelope: p(r<=0.5)=1... p=2/3 at recall 1 -> AP ~ (0.5*1 + 0.5*2/3)
    assert 0.8 < ap < 0.87
