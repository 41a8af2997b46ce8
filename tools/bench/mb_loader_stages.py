#!/usr/bin/env python
"""Microbenchmark: host data-pipeline per-stage budget (STATUS table).

Two scenarios, both pure-host (no device work):

1. KITTI lidar (122k pts, V=131k): SegPreprocess (augment) -> SegVoxelization
   (native C radix-sort voxelizer) -> SegAssignLabel (compact_value vote) ->
   collate+pad. Reproduces the STATUS.md 38.5 ms/frame budget.
2. nuScenes 6-camera multimodal (VERDICT r3 item 7): SegImagePreprocess over
   six 900x1600 uint8 cameras resized to 640x960 with the flagship train
   augs (h-flip, color jitter, JPEG compression) + points_cuv co-transform,
   measured per sub-stage (resize / jitter / jpeg / normalize), in train and
   val modes, plus the lidar stages at nusc scale (V=120k, 0.1 m grid).

The loader >= 1.5x device criterion is per WORKER; this box has 1 vCPU, so
multiply by the production worker count (shm worker ring, datasets/loader.py).

Run: PYTHONPATH=/root/repo python tools/bench/mb_loader_stages.py
     [--frames 20] [--scenario kitti nusc]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def synth_points(rng, n, pcr):
    r = 0.95 * min(-pcr[0], pcr[3])
    pts = np.stack([
        rng.uniform(-r, r, n), rng.uniform(-r, r, n),
        rng.uniform(pcr[2] * 0.9, pcr[5] * 0.9, n), rng.uniform(0, 1, n),
    ], 1).astype(np.float32)
    sem = rng.integers(0, 20, n).astype(np.int32)
    inst = np.zeros(n, np.int32)
    return pts, sem, inst


def time_stage(fn, frames_in):
    outs = []
    t0 = time.perf_counter()
    for fr in frames_in:
        outs.append(fn(fr))
    dt = (time.perf_counter() - t0) / len(frames_in) * 1000
    return outs, dt


def lidar_stages(nframes, n, pcr, vsz, V, name, seed=0):
    from lidarseg3d_tpu.datasets.batching import collate_segnet
    from lidarseg3d_tpu.datasets.pipelines.seg_preprocess import (
        SegAssignLabel, SegPreprocess, SegVoxelization,
    )

    rng = np.random.default_rng(seed)
    pre = SegPreprocess(cfg=dict(
        mode="train", shuffle_points=True, global_rot_noise=[-0.785, 0.785],
        global_scale_noise=[0.95, 1.05], global_translate_std=0.5))
    vox = SegVoxelization(cfg=dict(
        range=list(pcr), voxel_size=list(vsz), max_points_in_voxel=5,
        max_voxel_num=[V, V]))
    assign = SegAssignLabel(cfg=dict(voxel_label_enc="compact_value"))
    info = {"dim": {"points": 4}}

    samples = []
    for _ in range(nframes):
        pts, sem, inst = synth_points(rng, n, pcr)
        samples.append({
            "points": pts, "mode": "train",
            "annotations": {"point_sem_labels": sem,
                            "point_inst_labels": inst},
        })

    rows = [(name, "n/a", "")]
    samples, dt = time_stage(lambda s: pre(s, info)[0], samples)
    rows.append(("  augment (flip/rot/scale/translate/shuffle)", dt, ""))
    samples, dt = time_stage(lambda s: vox(s, info)[0], samples)
    rows.append(("  voxelize (native C radix sort)", dt, ""))
    samples, dt = time_stage(lambda s: assign(s, info)[0], samples)
    rows.append(("  voxel label vote (compact_value)", dt, ""))

    def to_frame(s):
        v = s["voxels"]
        return {
            "voxels": v["voxels"], "coordinates": v["coordinates"],
            "num_points_per_voxel": v["num_points"], "points": s["points"],
            "voxel_sem_labels": s["targets"]["voxel_sem_labels"],
            "point_sem_labels": s["targets"]["point_sem_labels"],
        }

    frames = [to_frame(s) for s in samples]
    _, dt = time_stage(
        lambda fr: collate_segnet([fr], max_voxels=V, max_points=n), frames)
    rows.append(("  collate+pad to capacity", dt, ""))
    return rows


def nusc_image_stages(nframes, ncam=6, src_hw=(900, 1600),
                      resized_wh=(960, 640), npts=30000, seed=0):
    from lidarseg3d_tpu.datasets.pipelines import img_transforms as T
    from lidarseg3d_tpu.datasets.pipelines.seg_preprocess import (
        SegImagePreprocess,
    )

    rng = np.random.default_rng(seed)
    cam_names = [str(i + 1) for i in range(ncam)]
    info = {"cam": {
        "names": cam_names,
        "attributes": {c: dict(mean=[0.406, 0.456, 0.485],
                               std=[0.225, 0.224, 0.229]) for c in cam_names},
        "resized_shape": resized_wh,
    }}

    def make_sample(mode):
        images = [rng.integers(0, 255, (*src_hw, 3), dtype=np.uint8)
                  for _ in range(ncam)]
        cp = np.zeros((npts, 3), np.float32)
        cp[:, 0] = rng.integers(0, ncam + 1, npts)  # 0 = no camera
        cp[:, 1] = rng.uniform(0, src_hw[1] - 1, npts)  # u
        cp[:, 2] = rng.uniform(0, src_hw[0] - 1, npts)  # v
        return {"mode": mode, "images": images, "points_cp": cp, "rng": rng}

    rows = [(f"nuScenes {ncam}-cam images "
             f"{src_hw[1]}x{src_hw[0]} -> {resized_wh[0]}x{resized_wh[1]}, "
             f"{npts//1000}k pts", "n/a", "")]

    # full stage, train augs (the flagship recipe) and val
    full_train = SegImagePreprocess(cfg=dict(
        random_horizon_flip=True,
        random_color_jitter_cfg=dict(brightness=0.3, contrast=0.3,
                                     saturation=0.3, hue=0.1),
        random_jpeg_compression_cfg=dict(quality_noise=[30, 70],
                                         probability=0.5),
    ))
    full_val = SegImagePreprocess(cfg=dict())
    _, dt = time_stage(lambda s: full_train(s, info)[0],
                       [make_sample("train") for _ in range(nframes)])
    rows.append(("  SegImagePreprocess TRAIN (all augs)", dt, ""))
    _, dt = time_stage(lambda s: full_val(s, info)[0],
                       [make_sample("val") for _ in range(nframes)])
    rows.append(("  SegImagePreprocess VAL (resize+normalize)", dt, ""))

    # sub-stage attribution on one camera set
    imgs = [rng.integers(0, 255, (*src_hw, 3), dtype=np.uint8)
            for _ in range(ncam)]
    cp = np.zeros((0, 3), np.float32)

    def per_cam(fn):
        t0 = time.perf_counter()
        for _ in range(nframes):
            for im in imgs:
                fn(im)
        return (time.perf_counter() - t0) / nframes * 1000

    dt = per_cam(lambda im: T.resize_image_points_label(
        im, cp, None, resized_wh)[0])
    rows.append(("    resize (cv2, x6)", dt, ""))
    small = [T.resize_image_points_label(im, cp, None, resized_wh)[0]
             for im in imgs]

    def per_cam_s(fn):
        t0 = time.perf_counter()
        for _ in range(nframes):
            for im in small:
                fn(im)
        return (time.perf_counter() - t0) / nframes * 1000

    dt = per_cam_s(lambda im: T.color_jitter(
        im, rng, brightness=0.3, contrast=0.3, saturation=0.3, hue=0.1))
    rows.append(("    color jitter (x6)", dt, ""))
    dt = per_cam_s(lambda im: T.jpeg_compression(
        im, rng, quality_noise=[30, 70], probability=1.0))
    rows.append(("    jpeg compression p=1 (x6)", dt, ""))
    dt = per_cam_s(lambda im: T.normalize_image(
        im, [0.406, 0.456, 0.485], [0.225, 0.224, 0.229]))
    rows.append(("    normalize to fp32 (x6)", dt, ""))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--scenario", nargs="+", default=["kitti", "nusc"])
    args = ap.parse_args()

    all_rows = []
    if "kitti" in args.scenario:
        all_rows += lidar_stages(
            args.frames, n=122880, pcr=(-25.6, -25.6, -4.0, 25.6, 25.6, 2.0),
            vsz=(0.2, 0.2, 0.3), V=131072,
            name="KITTI lidar (122k pts, V=131k)")
    if "nusc" in args.scenario:
        all_rows += lidar_stages(
            args.frames, n=100000, pcr=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
            vsz=(0.1, 0.1, 0.2), V=120000,
            name="nuScenes lidar (100k pts, V=120k, 0.1 m grid)")
        all_rows += nusc_image_stages(max(4, args.frames // 4))

    print(f"{'stage':56s} ms/frame")
    totals = {}
    cur = None
    for name, dt, _ in all_rows:
        if dt == "n/a":
            cur = name
            totals[cur] = 0.0
            print(f"\n{name}")
        else:
            if name.startswith("  ") and not name.startswith("    "):
                totals[cur] += dt
            print(f"{name:56s} {dt:8.1f}")
    print()
    for k, v in totals.items():
        print(f"TOTAL {k}: {v:.1f} ms/frame = {1000/v:.1f} scans/s/worker")


if __name__ == "__main__":
    main()
