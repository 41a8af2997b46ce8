"""Constant-velocity BEV multi-object tracker (CenterPoint "tracking by
velocity" scheme).

Host-side numpy; re-implements the matching logic of the reference's two
tracker variants in one class:

- /root/reference/tools/nusc_tracking/pub_tracker.py (per-class distance
  gates, optional Hungarian matching, unconditional births)
- /root/reference/tools/waymo_tracking/tracker.py (score-thresholded
  births, greedy matching)

Scheme: each detection carries a BEV velocity; detections are retro-
projected by ``-velocity * time_lag`` onto the previous frame, matched to
live tracks by gated nearest-center assignment, and unmatched tracks
coast (centers advanced by their last velocity) for up to ``max_age``
frames before deletion. Coasting tracks are kept for future matching but
flagged inactive so drivers skip them in the per-frame output.
"""

import numpy as np

INVALID = 1e18


def greedy_assignment(dist):
    """Row-greedy matching: each det (row) takes its nearest still-free
    track (column) if the gated cost is finite. Returns [M, 2] int32 of
    (det_idx, track_idx) pairs."""
    matches = []
    if dist.shape[1] == 0:
        return np.zeros((0, 2), np.int32)
    dist = dist.copy()
    for i in range(dist.shape[0]):
        j = int(dist[i].argmin())
        if dist[i, j] < INVALID / 100:
            dist[:, j] = INVALID
            matches.append((i, j))
    return np.asarray(matches, np.int32).reshape(-1, 2)


def hungarian_assignment(dist):
    """Optimal assignment via scipy; invalid (gated-out) pairs are removed
    from the result like the reference's post-filter."""
    from scipy.optimize import linear_sum_assignment

    cost = np.minimum(dist, INVALID)
    rows, cols = linear_sum_assignment(cost)
    keep = cost[rows, cols] < INVALID / 100
    return np.stack([rows[keep], cols[keep]], axis=-1).astype(np.int32)


class CenterTracker:
    """Args:
        class_names: tracked class names; detections of other classes are
            dropped (reference filters against *_TRACKING_NAMES).
        max_dist: {class_name: gate_meters} — maximum matching distance
            per class (velocity-error percentile in the reference).
        max_age: frames a lost track coasts before deletion.
        score_thresh: minimum detection score to BIRTH a new track
            (waymo tracker behavior; None = unconditional births as in the
            nusc tracker).
        hungarian: optimal instead of greedy assignment.

    step() input: list of dicts with at least
        translation [>=2] (global frame), velocity [2] (global BEV m/s),
        detection_name (str), score (float); extra keys pass through.
    Output: the per-frame track list; entries have tracking_id (int,
        1-based), active (0 while coasting), age, plus the input keys.
    """

    def __init__(self, class_names, max_dist, max_age=3, score_thresh=None,
                 hungarian=False):
        self.class_names = list(class_names)
        self.max_dist = dict(max_dist)
        self.max_age = max_age
        self.score_thresh = score_thresh
        self.hungarian = hungarian
        self.reset()

    def reset(self):
        self.id_count = 0
        self.tracks = []

    def step(self, detections, time_lag):
        """Advance one frame. time_lag: seconds since the previous frame
        (0 on the first frame of a sequence after reset())."""
        dets = []
        for d in detections:
            name = d["detection_name"]
            if name not in self.class_names:
                continue
            d = dict(d)
            d["ct"] = np.asarray(d["translation"][:2], np.float32)
            # retro-project onto the previous frame's time under the
            # constant-velocity model
            d["motion"] = -np.asarray(d["velocity"][:2], np.float32) * time_lag
            d["cls_id"] = self.class_names.index(name)
            dets.append(d)
        if not dets:
            self.tracks = []
            return []

        N, M = len(dets), len(self.tracks)
        det_ct = np.stack([d["ct"] + d["motion"] for d in dets])
        det_cls = np.asarray([d["cls_id"] for d in dets], np.int32)
        gates = np.asarray(
            [self.max_dist[d["detection_name"]] for d in dets], np.float32)

        if M:
            trk_ct = np.stack([t["ct"] for t in self.tracks])
            trk_cls = np.asarray([t["cls_id"] for t in self.tracks], np.int32)
            dist = np.linalg.norm(
                det_ct[:, None, :] - trk_ct[None, :, :], axis=-1)
            bad = (dist > gates[:, None]) | (det_cls[:, None]
                                            != trk_cls[None, :])
            dist = np.where(bad, INVALID, dist)
            assign = (hungarian_assignment if self.hungarian
                      else greedy_assignment)
            matches = assign(dist)
        else:
            matches = np.zeros((0, 2), np.int32)

        matched_dets = set(int(m) for m in matches[:, 0])
        matched_trks = set(int(m) for m in matches[:, 1])

        out = []
        for di, ti in matches:
            t = dets[di]
            prev = self.tracks[ti]
            t["tracking_id"] = prev["tracking_id"]
            t["age"] = 1
            t["active"] = prev["active"] + 1
            out.append(t)
        for di in range(N):
            if di in matched_dets:
                continue
            t = dets[di]
            if (self.score_thresh is not None
                    and t["score"] <= self.score_thresh):
                continue
            self.id_count += 1
            t["tracking_id"] = self.id_count
            t["age"] = 1
            t["active"] = 1
            out.append(t)
        for ti in range(M):
            if ti in matched_trks:
                continue
            t = self.tracks[ti]
            if t["age"] < self.max_age:
                t["age"] += 1
                t["active"] = 0
                # coast forward under the last observed velocity
                t["ct"] = t["ct"] - t["motion"]
                out.append(t)
        self.tracks = out
        return out


# reference gate tables (pub_tracker.py / waymo_tracking/test.py defaults)
NUSC_TRACKING_NAMES = (
    "bicycle", "bus", "car", "motorcycle", "pedestrian", "trailer", "truck",
)
NUSC_CLS_VELOCITY_ERROR = {
    "car": 4, "truck": 4, "bus": 5.5, "trailer": 3, "pedestrian": 1,
    "motorcycle": 13, "bicycle": 3,
}
WAYMO_TRACKING_NAMES = ("VEHICLE", "PEDESTRIAN", "CYCLIST")
