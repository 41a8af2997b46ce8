#!/usr/bin/env python
"""Synthetic end-to-end mIoU closure (VERDICT r3 item 4).

No real dataset exists on this machine, so this script exercises the FULL
production path on a procedurally-labeled synthetic SemanticKITTI split —
the closest attainable stand-in for the reference's dist_test.py validation
run until real data is mounted (docs/PARITY.md has the real-data recipe):

  1. writes a ~50-frame fixture (velodyne/labels/image_2/calib) where the
     label is a LEARNABLE function of position — radial ring x z-sign,
     classes 1..8. The function is INVARIANT under the TTA transform
     family used in step 3 (x/y flips + z-rotation), so the TTA merge
     path (apis/eval.py ArithmeticMean, reference
     point_seg_batchloss_head.py:190-245) is assertable, not advisory
     (VERDICT r4 item 6);
  2. runs the real tools/train.py on configs/tests/mini_semkitti_mseg3d.py
     (flagship MSeg3D dataflow: HRNet image branch, fusion, SFFM);
  3. runs the real tools/test.py (checkpoint -> dataset.evaluation mIoU),
     plus a --tta pass with rotation+flip-only variants (tta_cfg disables
     scale/translate so the label stays invariant);
  4. asserts the eval mIoU over present classes clears a threshold AND
     the TTA mIoU is within epsilon of (or above) the plain mIoU.

Usage: python tools/synthetic_e2e.py [--epochs 12] [--frames 40]
       [--root /tmp/minikitti_e2e] [--min-miou 0.85]
"""

import argparse
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMH, IMW = 64, 128


def write_fixture(root, frames, n=1400, seed=0):
    import cv2

    from lidarseg3d_tpu.datasets.semantickitti import metadata as meta

    # one raw id per train class (invert LEARNING_MAP); class 0 is ignore
    inv = {}
    for raw, tr in meta.LEARNING_MAP.items():
        inv.setdefault(tr, raw)
    rng = np.random.default_rng(seed)
    seq = os.path.join(root, "00")
    for d in ("velodyne", "labels", "image_2"):
        os.makedirs(os.path.join(seq, d), exist_ok=True)
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        P = f"500 0 {IMW / 2} 0 0 500 {IMH / 2} 0 0 0 1 0"
        f.write(f"P0: {P}\nP1: {P}\nP2: {P}\nP3: {P}\n")
        f.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
    for i in range(frames):
        pts = np.stack([
            rng.uniform(-5.5, 5.5, n), rng.uniform(-5.5, 5.5, n),
            rng.uniform(-1.8, 1.8, n), rng.uniform(0, 1, n),
        ], 1).astype(np.float32)
        # learnable label: radial ring x z-sign -> train classes 1..8.
        # r and sign(z) are invariant under x/y flips and z-rotations,
        # so flip/rotate TTA variants carry the same ground truth
        r = np.hypot(pts[:, 0], pts[:, 1])
        ring = np.digitize(r, [2.0, 3.5, 5.0])  # 0..3
        train_cls = ring * 2 + (pts[:, 2] > 0).astype(np.int64) + 1
        raw = np.asarray([inv[c] for c in train_cls], np.uint32)
        pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        (raw | (np.uint32(1) << 16)).tofile(
            os.path.join(seq, "labels", f"{i:06d}.label"))
        img = rng.integers(0, 255, (IMH, IMW, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(seq, "image_2", f"{i:06d}.png"), img)


def run(cmd, env):
    print("::", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, env=env, cwd=REPO, text=True,
                          capture_output=True)
    sys.stdout.write(proc.stdout[-6000:])
    sys.stderr.write(proc.stderr[-3000:])
    assert proc.returncode == 0, f"command failed: {' '.join(cmd)}"
    return proc.stdout + proc.stderr


def parse_miou(text):
    m = re.findall(r"mIoU[^0-9]*([0-9.]+)", text)
    assert m, "no mIoU in output"
    v = float(m[-1])
    return v / 100.0 if v > 1.5 else v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--root", default="/tmp/minikitti_e2e")
    ap.add_argument("--min-miou", type=float, default=0.85)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()

    fixture = os.path.join(args.root, "seqs")
    work = os.path.join(args.root, "work")
    write_fixture(fixture, args.frames)
    print(f"fixture: {args.frames} frames at {fixture}")

    # point the mini config at this fixture via a tiny overlay config
    overlay = os.path.join(args.root, "cfg.py")
    with open(overlay, "w") as f:
        f.write(
            "import os\n"
            "_base = os.path.join(os.path.dirname(os.path.abspath(__file__)))\n"
            f"exec(open(r'{REPO}/configs/tests/mini_semkitti_mseg3d.py').read())\n"
            f"data_root = r'{fixture}'\n"
            f"work_dir = r'{work}'\n"
            "for _d in (data['train'], data['val'], data['test']):\n"
            "    _d['root_path'] = data_root\n"
            f"total_epochs = {args.epochs}\n"
            f"lr_config = dict(type='one_cycle', lr_max={args.lr},\n"
            "                 moms=[0.95, 0.85], div_factor=10.0,\n"
            "                 pct_start=0.4)\n"
            # the synthetic label is a function of ABSOLUTE position, so
            # geometric augmentation (flip/rot/scale/translate) moves the
            # label boundary per-sample and makes the task unlearnable —
            # with random x/y flips on, only the z octant bit is stable and
            # training plateaus at ~20% mIoU. Disable ALL geometric aug for
            # the overfit closure (the real configs keep it)
            "for _st in data['train']['pipeline']:\n"
            "    if _st['type'] == 'SegPreprocess':\n"
            "        _st['cfg'] = dict(_st['cfg'], no_augmentation=True)\n"
            # TTA restricted to the label-invariant transforms (x/y flip +
            # z-rotation): scale/translate would move the radial-ring
            # boundary and reintroduce the advisory-only problem
            "tta_cfg = dict(num_tta_tranforms=4,\n"
            "               global_rot_noise=[-0.78539816, 0.78539816],\n"
            "               global_scale_noise=[1.0, 1.0],\n"
            "               global_translate_std=0.0)\n"
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    out = run([sys.executable, "tools/train.py", overlay,
               "--work_dir", work, "--device", args.device,
               "--batch_size", "2"], env)

    out_eval = run([sys.executable, "tools/test.py", overlay,
                    "--checkpoint", work, "--work_dir", work,
                    "--device", args.device], env)
    miou = parse_miou(out_eval)
    print(f"\nEVAL mIoU (full stack, {args.frames} frames, "
          f"{args.epochs} epochs): {miou:.4f}")

    out_tta = run([sys.executable, "tools/test.py", overlay,
                   "--checkpoint", work, "--work_dir", work,
                   "--device", args.device, "--tta"], env)
    miou_tta = parse_miou(out_tta)
    print(f"EVAL mIoU with TTA: {miou_tta:.4f}")

    assert miou >= args.min_miou, (
        f"end-to-end mIoU {miou:.4f} < {args.min_miou}: the train->ckpt->"
        "eval path does not close")
    # the label is invariant under the TTA transforms, so the merged
    # prediction must not degrade: this asserts the ArithmeticMean logit
    # merge path end-to-end (VERDICT r4 item 6)
    assert miou_tta >= miou - 0.02, (
        f"TTA mIoU {miou_tta:.4f} < plain {miou:.4f} - 0.02: the TTA "
        "merge path degrades an invariant-label task")
    print("SYNTHETIC E2E CLOSURE: OK (plain "
          f"{miou:.4f}, tta {miou_tta:.4f})")


if __name__ == "__main__":
    main()
