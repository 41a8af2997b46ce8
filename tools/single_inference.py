#!/usr/bin/env python
"""Single-scan inference demo.

Equivalent of /root/reference/tools/single_infernece.py (sans ROS): load a
config + checkpoint, segment one .bin scan, save/print the per-point labels.

Usage:
  python tools/single_inference.py CONFIG --checkpoint WORK_DIR \
      --scan path/to/scan.bin [--out labels.npy] [--device cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--scan", required=True, help=".bin point cloud file")
    p.add_argument("--out", default=None, help="output .npy of labels")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    return p.parse_args()


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
    from lidarseg3d_tpu.apis.train import TrainState, load_checkpoint

    cfg = Config.fromfile(args.config)
    nfeat = 4 if "KITTI" in cfg.dataset_type else 5
    points = np.fromfile(args.scan, dtype=np.float32).reshape(-1, nfeat)

    vg_cfg = cfg.voxel_generator
    vg = VoxelGenerator(vg_cfg["voxel_size"], vg_cfg["range"],
                        vg_cfg["max_points_in_voxel"],
                        vg_cfg["max_voxel_num"][1])
    voxels, coords, npts = vg.generate(points)
    cap = cfg.get("capacity", {})
    frame = {"voxels": voxels, "coordinates": coords,
             "num_points_per_voxel": npts, "points": points,
             "metadata": {"token": os.path.basename(args.scan)}}
    batch = collate_segnet([frame], cap.get("max_voxels", 160000),
                           cap.get("max_points", 140000))
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}
    grid = vg.grid_size
    input_shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
    ex["input_shape"] = input_shape

    model = build_detector(cfg.model.to_dict(), test_cfg=cfg.get("test_cfg"))
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)
    template = {"step": jnp.zeros((), jnp.int32),
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    restored, _ = load_checkpoint(args.checkpoint, template, partial=True)
    state_vars = {"params": restored["params"],
                  "batch_stats": restored["batch_stats"]}

    arrs = {k: v for k, v in ex.items() if k != "input_shape"}

    @jax.jit
    def infer(v, e):
        ee = dict(e)
        ee["input_shape"] = input_shape  # static via closure
        ret, bat = model.apply(v, ee, train=False)
        return model.predict(ret, bat)["pred_point_sem_labels"]

    t0 = time.time()
    labels = np.asarray(infer(state_vars, arrs))[0][: len(points)]
    print(f"inference: {time.time()-t0:.2f}s (incl. compile), "
          f"{len(points)} points")
    uniq, cnt = np.unique(labels, return_counts=True)
    for u, c in zip(uniq, cnt):
        print(f"  class {u}: {c} points")
    if args.out:
        np.save(args.out, labels)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
