#!/usr/bin/env python
"""nuScenes tracking from detection results.

Equivalent of /root/reference/tools/nusc_tracking/pub_test.py, devkit-free:
frame metadata (token / timestamp / sequence-start flag) comes from this
package's info pkls (datasets/nuscenes/common.py) instead of a NuScenes DB
instance. Input is a detection result JSON in the official nuScenes
detection format ({"results": {sample_token: [box dicts]}}); output is
tracking_result.json in the official nuScenes tracking format, evaluable
with the standard nuscenes-devkit TrackingEval
(`python -m nuscenes.eval.tracking.evaluate tracking_result.json ...`).

Usage:
  python tools/nusc_tracking.py --checkpoint det_results.json \
      --info_path infos_val_01sweeps_segdet.pkl --work_dir out/ \
      [--max_age 3] [--hungarian]
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidarseg3d_tpu.tracking.tracker import (
    CenterTracker, NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR,
)


def parse_args():
    p = argparse.ArgumentParser(description="nuScenes tracking")
    p.add_argument("--work_dir", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="detection result json (nusc detection format)")
    p.add_argument("--info_path", required=True,
                   help="val/test info pkl from create_data nuscenes_data")
    p.add_argument("--hungarian", action="store_true")
    p.add_argument("--max_age", type=int, default=3)
    return p.parse_args()


def load_frames(info_path):
    """Info pkl -> ordered frame meta [{token, timestamp, first}]."""
    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    frames = []
    prev_scene = object()
    for info in infos:
        scene = info.get("scene_name", None)
        first = info.get("first", scene != prev_scene)
        prev_scene = scene
        frames.append(dict(token=info["token"],
                           timestamp=float(info["timestamp"]),
                           first=bool(first)))
    return frames


def run_tracking(predictions, frames, max_age=3, hungarian=False):
    tracker = CenterTracker(
        NUSC_TRACKING_NAMES, NUSC_CLS_VELOCITY_ERROR, max_age=max_age,
        hungarian=hungarian)
    results = {}
    last_ts = 0.0
    for fr in frames:
        token = fr["token"]
        if fr["first"]:
            tracker.reset()
            last_ts = fr["timestamp"]
        time_lag = fr["timestamp"] - last_ts
        last_ts = fr["timestamp"]
        dets = []
        for d in predictions.get(token, []):
            d = dict(d)
            d["score"] = d.get("detection_score", 1.0)
            dets.append(d)
        out = tracker.step(dets, time_lag)
        annos = []
        for item in out:
            if item["active"] == 0:
                continue  # coasting tracks are kept but not reported
            annos.append({
                "sample_token": token,
                "translation": list(map(float, item["translation"])),
                "size": list(map(float, item["size"])),
                "rotation": list(map(float, item["rotation"])),
                "velocity": list(map(float, item["velocity"][:2])),
                "tracking_id": str(item["tracking_id"]),
                "tracking_name": item["detection_name"],
                "tracking_score": float(item["score"]),
            })
        results[token] = annos
    return results


def main():
    args = parse_args()
    with open(args.checkpoint) as f:
        predictions = json.load(f)["results"]
    frames = load_frames(args.info_path)
    print(f"tracking {len(frames)} frames")
    t0 = time.time()
    results = run_tracking(predictions, frames, args.max_age, args.hungarian)
    dt = time.time() - t0
    print(f"{len(frames) / max(dt, 1e-9):.1f} FPS")
    os.makedirs(args.work_dir, exist_ok=True)
    out = {
        "results": results,
        "meta": {"use_camera": False, "use_lidar": True, "use_radar": False,
                 "use_map": False, "use_external": False},
    }
    path = os.path.join(args.work_dir, "tracking_result.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
