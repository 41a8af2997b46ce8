"""CenterTracker unit tests (host-only numpy; reference semantics from
tools/nusc_tracking/pub_tracker.py + tools/waymo_tracking/tracker.py)."""

import numpy as np

from lidarseg3d_tpu.tracking.tracker import (
    CenterTracker, greedy_assignment, hungarian_assignment,
    NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR, WAYMO_TRACKING_NAMES,
)


def det(x, y, vx=0.0, vy=0.0, name="car", score=0.9):
    return dict(translation=[x, y, 0.0], velocity=[vx, vy],
                detection_name=name, score=score)


def test_greedy_assignment_prefers_nearest_and_is_exclusive():
    dist = np.array([[1.0, 5.0], [1.2, 9.0]])
    m = greedy_assignment(dist)
    # det0 takes track0; det1 must settle for track1 (track0 taken)
    assert m.tolist() == [[0, 0], [1, 1]]
    empty = greedy_assignment(np.zeros((3, 0)))
    assert empty.shape == (0, 2)


def test_hungarian_beats_greedy_on_crossing():
    # greedy gives total 0.5 + 10; hungarian 1.0 + 1.0
    dist = np.array([[0.5, 1.0], [1.0, 10.0]])
    g = greedy_assignment(dist)
    h = hungarian_assignment(dist)
    assert g.tolist() == [[0, 0], [1, 1]]
    assert sorted(h.tolist()) == [[0, 1], [1, 0]]


def test_identity_persists_under_constant_velocity():
    tr = CenterTracker(NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR,
                       max_age=3)
    out0 = tr.step([det(0, 0, vx=2.0), det(50, 0, vx=-1.0)], 0.0)
    ids0 = {round(d["translation"][0]): d["tracking_id"] for d in out0}
    # 0.5 s later both moved by v*dt; detections report current position
    out1 = tr.step([det(1.0, 0, vx=2.0), det(49.5, 0, vx=-1.0)], 0.5)
    ids1 = {round(d["translation"][0]) - (1 if d["translation"][0] < 25
                                          else 50): None for d in out1}
    by_id = {d["tracking_id"]: d["translation"][0] for d in out1}
    assert by_id[ids0[0]] == 1.0
    assert by_id[ids0[50]] == 49.5
    assert len(out1) == 2


def test_class_gate_blocks_cross_class_match():
    tr = CenterTracker(NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR)
    out0 = tr.step([det(0, 0, name="car")], 0.0)
    out1 = tr.step([det(0.5, 0, name="pedestrian")], 0.5)
    # same place, different class -> new id
    assert out1[0]["tracking_id"] != out0[0]["tracking_id"]


def test_distance_gate_blocks_far_match():
    tr = CenterTracker(NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR)
    out0 = tr.step([det(0, 0, name="pedestrian")], 0.0)
    # pedestrian gate is 1 m; 3 m jump must not match
    out1 = tr.step([det(3.0, 0, name="pedestrian")], 0.5)
    active = [d for d in out1 if d["active"]]
    assert active[0]["tracking_id"] != out0[0]["tracking_id"]


def test_coasting_track_rematches_within_max_age():
    tr = CenterTracker(NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR,
                       max_age=3)
    tid = tr.step([det(0, 0, vx=2.0)], 0.0)[0]["tracking_id"]
    tr.step([det(1.0, 0, vx=2.0)], 0.5)  # match: stores motion -v*dt
    # frame 2: miss (another far det keeps the tracker stepping)
    out2 = tr.step([det(100, 100)], 0.5)
    coasting = [d for d in out2 if d["active"] == 0]
    assert len(coasting) == 1 and coasting[0]["tracking_id"] == tid
    # coasted center advanced by +v*dt from its last observed position
    np.testing.assert_allclose(coasting[0]["ct"], [2.0, 0.0], atol=1e-6)
    # frame 3: reappears near the coasted position -> same id
    out3 = tr.step([det(3.0, 0, vx=2.0), det(100, 100)], 0.5)
    re = [d for d in out3 if d["translation"][0] == 3.0][0]
    assert re["tracking_id"] == tid and re["active"] >= 1


def test_track_dies_after_max_age():
    tr = CenterTracker(NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR,
                       max_age=2)
    tid = tr.step([det(0, 0)], 0.0)[0]["tracking_id"]
    tr.step([det(100, 100)], 0.5)  # age 2 (kept, inactive)
    tr.step([det(100, 100)], 0.5)  # age would exceed max_age -> dropped
    out = tr.step([det(0, 0)], 0.5)
    assert all(d["tracking_id"] != tid for d in out)


def test_score_threshold_gates_births_but_not_matches():
    tr = CenterTracker(WAYMO_TRACKING_NAMES,
                       {"VEHICLE": 2.0, "PEDESTRIAN": 1.0, "CYCLIST": 1.0},
                       max_age=3, score_thresh=0.75)
    # low-score det cannot start a track (waymo tracker birth rule)
    assert tr.step([det(0, 0, name="VEHICLE", score=0.5)], 0.0) == []
    tid = tr.step([det(0, 0, name="VEHICLE", score=0.9)],
                  0.5)[0]["tracking_id"]
    # but a low-score det CAN extend an existing track
    out = tr.step([det(0.5, 0, name="VEHICLE", score=0.2)], 0.5)
    assert out[0]["tracking_id"] == tid


def test_untracked_class_filtered():
    tr = CenterTracker(WAYMO_TRACKING_NAMES, {"VEHICLE": 2.0,
                                              "PEDESTRIAN": 1.0,
                                              "CYCLIST": 1.0})
    assert tr.step([det(0, 0, name="SIGN")], 0.0) == []


def test_nusc_driver_output_format(tmp_path):
    """tools/nusc_tracking.run_tracking produces the official tracking
    result schema and resets per scene."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "nusc_tracking",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "nusc_tracking.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    frames = [
        dict(token="a0", timestamp=0.0, first=True),
        dict(token="a1", timestamp=0.5, first=False),
        dict(token="b0", timestamp=100.0, first=True),
    ]
    box = dict(translation=[1.0, 2.0, 0.0], size=[2, 4, 1.5],
               rotation=[1, 0, 0, 0], velocity=[1.0, 0.0],
               detection_name="car", detection_score=0.8)
    preds = {
        "a0": [box],
        "a1": [dict(box, translation=[1.5, 2.0, 0.0])],
        "b0": [box],
    }
    res = mod.run_tracking(preds, frames)
    assert set(res) == {"a0", "a1", "b0"}
    a0, a1, b0 = res["a0"][0], res["a1"][0], res["b0"][0]
    assert a0["tracking_id"] == a1["tracking_id"]
    # scene reset: ids restart per scene (reference pub_tracker.reset()
    # zeroes id_count; nuScenes tracking eval is per-scene)
    assert b0["tracking_id"] == "1"
    for key in ("sample_token", "translation", "size", "rotation",
                "velocity", "tracking_id", "tracking_name",
                "tracking_score"):
        assert key in a0


def test_waymo_boxes_to_global_rotation():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "waymo_tracking",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "waymo_tracking.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    th = np.pi / 2
    pose = np.eye(4)
    pose[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    pose[:3, 3] = [10.0, 20.0, 1.0]
    boxes = np.array([[1.0, 0, 0, 4, 2, 1.5, 0.0]])
    vel = np.array([[3.0, 0.0]])
    g, gv = mod.boxes_to_global(boxes, vel, pose)
    np.testing.assert_allclose(g[0, :3], [10.0, 21.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(g[0, 6], th, atol=1e-9)
    np.testing.assert_allclose(gv[0], [0.0, 3.0], atol=1e-9)
