#!/usr/bin/env python
"""Visualize a segmented scan as a colored BEV image
(cf. /root/reference/tools/visual.py, without open3d/ROS).

Usage: python tools/visual.py --scan scan.bin --labels labels.npy \
    [--out bev.png] [--num_features 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def label_colors(num_classes, seed=0):
    rng = np.random.default_rng(seed)
    colors = rng.integers(40, 255, (num_classes, 3), dtype=np.uint8)
    colors[0] = (40, 40, 40)
    return colors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", required=True)
    ap.add_argument("--labels", required=True)
    ap.add_argument("--out", default="bev.png")
    ap.add_argument("--num_features", type=int, default=4)
    ap.add_argument("--extent", type=float, default=60.0)
    ap.add_argument("--resolution", type=float, default=0.15)
    args = ap.parse_args()

    import cv2

    pts = np.fromfile(args.scan, np.float32).reshape(-1, args.num_features)
    labels = np.load(args.labels).astype(np.int64)
    n = min(len(pts), len(labels))
    pts, labels = pts[:n], labels[:n]

    size = int(2 * args.extent / args.resolution)
    img = np.zeros((size, size, 3), np.uint8)
    xi = ((pts[:, 0] + args.extent) / args.resolution).astype(int)
    yi = ((pts[:, 1] + args.extent) / args.resolution).astype(int)
    ok = (xi >= 0) & (xi < size) & (yi >= 0) & (yi < size)
    colors = label_colors(int(labels.max()) + 1)
    img[size - 1 - yi[ok], xi[ok]] = colors[labels[ok]]
    cv2.imwrite(args.out, img)
    print(f"wrote {args.out} ({ok.sum()} points, "
          f"{len(np.unique(labels[ok]))} classes)")


if __name__ == "__main__":
    main()
