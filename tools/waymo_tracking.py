#!/usr/bin/env python
"""Waymo tracking from detection predictions.

Equivalent of /root/reference/tools/waymo_tracking/test.py: loads the
detection prediction pkl written by tools/test.py ({token: {box3d_lidar,
scores, label_preds, velocity?}}), transforms boxes into the global frame
with the stored vehicle pose (frame pkl key ``veh_to_global``, see
datasets/waymo/converter.py), runs the constant-velocity tracker per
sequence, and writes a metrics_pb2.Objects tracking submission evaluable
with the official compute_tracking_metrics_main.

Box layout note: this package keeps the NATIVE Waymo convention
[x, y, z, length, width, height, heading] end-to-end, so no axis swap /
heading negation is needed before the global transform (the reference
undoes its KITTI-style load conversion here, test.py:229-231).

Usage:
  python tools/waymo_tracking.py --checkpoint det_predictions.pkl \
      --info_path infos_val_01sweeps_segdet.pkl --work_dir out/ \
      [--max_age 3] [--vehicle 0.8] [--pedestrian 0.4] [--cyclist 0.6] \
      [--score_thresh 0.75]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lidarseg3d_tpu.tracking.tracker import (
    CenterTracker, WAYMO_TRACKING_NAMES,
)


def parse_args():
    p = argparse.ArgumentParser(description="Waymo tracking")
    p.add_argument("--work_dir", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="detection prediction pkl from tools/test.py")
    p.add_argument("--info_path", required=True)
    p.add_argument("--max_age", type=int, default=3)
    p.add_argument("--vehicle", type=float, default=0.8)
    p.add_argument("--pedestrian", type=float, default=0.4)
    p.add_argument("--cyclist", type=float, default=0.6)
    p.add_argument("--score_thresh", type=float, default=0.75)
    p.add_argument("--sweep", default=None,
                   help="gate line search (tools/waymo_tracking/"
                        "line_search.py equivalent): e.g. "
                        "'VEHICLE=0.5,0.8,1.1' writes one tracking bin "
                        "per value for external metric evaluation")
    return p.parse_args()


def boxes_to_global(boxes, velocity, pose):
    """[N, 7] native-Waymo boxes (+ [N, 2] BEV velocity) in the vehicle
    frame -> global frame."""
    R, t = pose[:3, :3], pose[:3, 3]
    out = boxes.copy()
    out[:, :3] = boxes[:, :3] @ R.T + t
    out[:, 6] = boxes[:, 6] + np.arctan2(pose[1, 0], pose[0, 0])
    vel3 = np.concatenate(
        [velocity, np.zeros((len(velocity), 1), velocity.dtype)], axis=-1)
    vel_g = (vel3 @ R.T)[:, :2]
    return out, vel_g


def load_pose_ts(info, frame_cache):
    """Pose + timestamp for one info row, reading the frame pkl when the
    info predates the converter fields."""
    if "veh_to_global" in info and "timestamp" in info:
        return (np.asarray(info["veh_to_global"], np.float64).reshape(4, 4),
                float(info["timestamp"]))
    with open(info["path"], "rb") as f:
        fr = pickle.load(f)
    return (np.asarray(fr["veh_to_global"], np.float64).reshape(4, 4),
            float(fr["timestamp"]))


def run_once(args, max_dist, filename):
    with open(args.checkpoint, "rb") as f:
        predictions = pickle.load(f)
    with open(args.info_path, "rb") as f:
        infos = pickle.load(f)
    infos = {i["token"]: i for i in infos}

    # order frames by (sequence context, timestamp)
    frames = []
    for token, info in infos.items():
        if token not in predictions:
            continue
        pose, ts = load_pose_ts(info, None)
        ctx = info.get("context", token.rsplit("_", 1)[0])
        frames.append(dict(token=token, context=ctx, timestamp=ts, pose=pose))
    frames.sort(key=lambda f: (f["context"], f["timestamp"]))

    tracker = CenterTracker(WAYMO_TRACKING_NAMES, max_dist,
                            max_age=args.max_age,
                            score_thresh=args.score_thresh)
    results = {}
    prev_ctx, last_ts = None, 0.0
    for fr in frames:
        token = fr["token"]
        det = predictions[token]
        if fr["context"] != prev_ctx:
            tracker.reset()
            last_ts = fr["timestamp"]
        prev_ctx = fr["context"]
        time_lag = fr["timestamp"] - last_ts
        last_ts = fr["timestamp"]

        boxes = np.asarray(det["box3d_lidar"], np.float64).reshape(-1, 7)
        scores = np.asarray(det["scores"], np.float64).reshape(-1)
        labels = np.asarray(det["label_preds"], np.int64).reshape(-1)
        valid = np.asarray(det.get("valid", np.ones(len(boxes), bool)),
                           bool).reshape(-1)
        vel = np.asarray(det.get("velocity",
                                 np.zeros((len(boxes), 2))),
                         np.float64).reshape(-1, 2)
        gboxes, gvel = boxes_to_global(boxes, vel, fr["pose"])
        dets = []
        for i in range(len(gboxes)):
            if not valid[i] or int(labels[i]) >= len(WAYMO_TRACKING_NAMES):
                continue
            dets.append(dict(
                translation=gboxes[i, :3],
                velocity=gvel[i],
                detection_name=WAYMO_TRACKING_NAMES[int(labels[i])],
                score=float(scores[i]),
                box_id=i,
            ))
        out = tracker.step(dets, time_lag)
        keep = [item for item in out if item["active"] != 0]
        idx = np.asarray([item["box_id"] for item in keep], np.int64)
        results[token] = {
            "tracking_ids": np.asarray(
                [item["tracking_id"] for item in keep], np.int64),
            "box3d_lidar": boxes[idx] if len(idx) else boxes[:0],
            "label_preds": labels[idx] if len(idx) else labels[:0],
            "scores": scores[idx] if len(idx) else scores[:0],
        }

    os.makedirs(args.work_dir, exist_ok=True)
    from lidarseg3d_tpu.datasets.waymo.det_submission import (
        write_detection_objects,
    )
    path = write_detection_objects(results, args.work_dir,
                                   filename=filename)
    print(f"wrote {path}")
    print("evaluate with the official waymo-open-dataset "
          "compute_tracking_metrics_main against gt.bin")


def main():
    args = parse_args()
    max_dist = {"VEHICLE": args.vehicle, "PEDESTRIAN": args.pedestrian,
                "CYCLIST": args.cyclist}
    if not args.sweep:
        run_once(args, max_dist, "tracking_pred.bin")
        return
    # gate line search (reference tools/waymo_tracking/line_search.py):
    # one tracking submission per candidate value; score them externally
    # with compute_tracking_metrics_main and keep the best
    cls, values = args.sweep.split("=")
    for v in values.split(","):
        md = dict(max_dist)
        md[cls] = float(v)
        run_once(args, md, f"tracking_pred_{cls}_{v}.bin")


if __name__ == "__main__":
    main()
