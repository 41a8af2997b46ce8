#!/usr/bin/env python
"""Dataset info-file preparation (cf. /root/reference/tools/create_data.py).

Usage:
  python tools/create_data.py semanticnusc --root data/SemanticNusc \
      [--version v1.0-trainval] [--nsweeps 1] [--cams]
  python tools/create_data.py semanticwaymo --root data/SemanticWaymo ...

--dry-data validates the mounted raw tree (paths, file sizes, label
bit-layout) and exits without writing anything — run it first so a
mis-mounted dataset fails in seconds, not mid-conversion
(lidarseg3d_tpu/datasets/validate.py). semantickitti needs no info files,
so it is accepted with --dry-data only.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["semanticnusc", "semanticwaymo",
                                    "waymo_gt_database", "semantickitti"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--nsweeps", type=int, default=1)
    ap.add_argument("--cams", action="store_true",
                    help="include 6-camera calibration/paths (MSeg3D)")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--dry-data", action="store_true",
                    help="validate the mounted raw tree and exit")
    ap.add_argument("--split", default="training",
                    help="waymo tfrecord split dir for --dry-data")
    args = ap.parse_args()

    if args.dataset == "semantickitti" and not args.dry_data:
        ap.error("semantickitti reads raw sequences (no info files); "
                 "only --dry-data validation applies")

    if args.dry_data:
        from lidarseg3d_tpu.datasets import validate as dv

        if args.dataset == "semantickitti":
            rep = dv.validate_semantickitti(args.root, use_img=args.cams)
        elif args.dataset == "semanticnusc":
            rep = dv.validate_semanticnusc(args.root, version=args.version)
        else:
            rep = dv.validate_semanticwaymo(args.root, split=args.split)
        print(f"dry-data OK: {rep}")
        return

    if args.dataset == "waymo_gt_database":
        # detection gt database for DBSampler paste augmentation
        from lidarseg3d_tpu.datasets import build_dataset
        from lidarseg3d_tpu.datasets.pipelines.det_pipeline import (
            create_gt_database,
        )

        info_path = os.path.join(
            args.root, f"infos_train_{args.nsweeps:02d}sweeps_segdet.pkl")
        ds = build_dataset(dict(
            type="SemanticWaymoDataset", root_path=args.root,
            info_path=info_path,
            pipeline=[
                dict(type="LoadPointCloudFromFile",
                     dataset="SemanticWaymoDataset"),
                dict(type="LoadDetAnnotations"),
            ],
        ))
        db = create_gt_database(
            ds, args.out_dir or args.root,
            class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"], min_points=5)
        print(f"wrote {db}")
        return

    if args.dataset == "semanticnusc":
        from lidarseg3d_tpu.datasets.nuscenes.common import (
            create_nuscenes_seg_infos,
        )
        from lidarseg3d_tpu.datasets.nuscenes.metadata import CAM_CHANS

        tr, va = create_nuscenes_seg_infos(
            args.root, version=args.version, nsweeps=args.nsweeps,
            cam_chans=CAM_CHANS if args.cams else None,
            out_dir=args.out_dir,
        )
        print(f"wrote {tr}\nwrote {va}")
    else:
        from lidarseg3d_tpu.datasets.waymo.converter import (
            create_semanticwaymo_infos,
        )

        out = create_semanticwaymo_infos(
            args.root, out_dir=args.out_dir, nsweeps=args.nsweeps
        )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
