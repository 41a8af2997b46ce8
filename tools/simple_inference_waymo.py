#!/usr/bin/env python
"""Single-frame Waymo DETECTION inference demo.

Equivalent of /root/reference/tools/simple_inference_waymo.py (sans the
open3d window, which needs a display): load a CenterPoint-family config +
checkpoint, read one converted Waymo frame pkl (datasets/waymo/converter.py
format: {"lidars": {"points_xyz", "points_feature"}, ...}) or a raw .bin,
voxelize, run the jitted forward + decode, and print/save the detected
boxes.

Usage:
  python tools/simple_inference_waymo.py CONFIG --checkpoint WORK_DIR \
      --frame seq0_frame0.pkl [--out dets.pkl] [--device cpu]
      [--visual out.png]
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--frame", required=True,
                   help="converted waymo frame .pkl (or raw .bin [x y z i e])")
    p.add_argument("--out", default=None, help="output .pkl of detections")
    p.add_argument("--visual", default=None,
                   help="save a BEV matplotlib rendering to this path")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    return p.parse_args()


def load_points(path, num_features=5):
    """Frame pkl (converter format) or raw float32 .bin -> [N, F] points."""
    if path.endswith(".bin"):
        return np.fromfile(path, dtype=np.float32).reshape(-1, num_features)
    with open(path, "rb") as f:
        obj = pickle.load(f)
    lid = obj["lidars"]
    pts = np.concatenate(
        [np.asarray(lid["points_xyz"], np.float32),
         np.asarray(lid["points_feature"], np.float32)], axis=1)
    return pts[:, :num_features]


def main():
    args = parse_args()
    from lidarseg3d_tpu.utils.platform import setup_jax

    setup_jax(args.device)

    import jax
    import jax.numpy as jnp
    from lidarseg3d_tpu.utils.config import Config
    from lidarseg3d_tpu.core.voxelize import VoxelGenerator
    from lidarseg3d_tpu.datasets.batching import collate_segnet
    from lidarseg3d_tpu.models import build_detector
    from lidarseg3d_tpu.apis.train import load_checkpoint

    cfg = Config.fromfile(args.config)
    vg_cfg = cfg.voxel_generator
    mv = vg_cfg["max_voxel_num"]
    max_voxels = mv[1] if isinstance(mv, (list, tuple)) else mv
    points = load_points(args.frame,
                         cfg.model["reader"].get("num_input_features", 5))

    vg = VoxelGenerator(vg_cfg["voxel_size"], vg_cfg["range"],
                        vg_cfg["max_points_in_voxel"], max_voxels)
    voxels, coords, npts = vg.generate(points)
    frame = {"voxels": voxels, "coordinates": coords,
             "num_points_per_voxel": npts, "points": points,
             "metadata": {"token": os.path.basename(args.frame)}}
    batch = collate_segnet([frame], max_voxels, len(points))
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}
    grid = vg.grid_size
    input_shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    test_cfg = dict(cfg.get("test_cfg", {}))
    model = build_detector(cfg.model.to_dict(), test_cfg=test_cfg)
    ex_init = dict(ex)
    ex_init["input_shape"] = input_shape
    variables = model.init(jax.random.PRNGKey(0), ex_init, train=False)
    template = {"step": jnp.zeros((), jnp.int32),
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    restored, _ = load_checkpoint(args.checkpoint, template, partial=True)
    state_vars = {"params": restored["params"],
                  "batch_stats": restored["batch_stats"]}

    @jax.jit
    def infer(v, e):
        ee = dict(e)
        ee["input_shape"] = input_shape
        rets, bat = model.apply(v, ee, train=False)
        out = model.predict(rets, bat, test_cfg)
        keep = {k: out[k]
                for k in ("box3d_lidar", "scores", "label_preds", "valid")}
        if "velocity" in out:
            keep["velocity"] = out["velocity"]
        return keep

    t0 = time.time()
    out = {k: np.asarray(v)[0] for k, v in infer(state_vars, ex).items()}
    print(f"inference: {time.time() - t0:.2f}s (incl. compile), "
          f"{len(points)} points")

    keep = out["valid"]
    boxes = out["box3d_lidar"][keep]
    scores = out["scores"][keep]
    labels = out["label_preds"][keep]
    names = list(cfg.get("class_names", []))
    print(f"{len(boxes)} detections:")
    for b, s, l in zip(boxes, scores, labels):
        name = names[int(l)] if int(l) < len(names) else str(int(l))
        print(f"  {name:12s} score {s:.3f} "
              f"xyz=({b[0]:6.1f},{b[1]:6.1f},{b[2]:5.1f}) "
              f"lwh=({b[3]:.1f},{b[4]:.1f},{b[5]:.1f}) yaw={b[6]:.2f}")

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump({"box3d_lidar": boxes, "scores": scores,
                         "label_preds": labels}, f)
        print(f"saved {args.out}")

    if args.visual:  # BEV scatter + box outlines (open3d-free)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 10))
        ax.scatter(points[:, 0], points[:, 1], s=0.05, c="gray")
        for b in boxes:
            x, y, _, l, w, _, yaw = b[:7]
            c, s = np.cos(yaw), np.sin(yaw)
            corners = np.array([[l, w], [l, -w], [-l, -w], [-l, w]]) / 2
            rot = corners @ np.array([[c, s], [-s, c]])
            poly = rot + [x, y]
            ax.plot(*np.vstack([poly, poly[:1]]).T, "r-", lw=0.8)
        ax.set_aspect("equal")
        fig.savefig(args.visual, dpi=120)
        print(f"saved {args.visual}")


if __name__ == "__main__":
    main()
