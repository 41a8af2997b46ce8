#!/usr/bin/env python
"""Panoptic instance library extraction for SemanticKITTI.

Mirrors /root/reference/tools/instance_preprocess.py: walk the train
sequences, cut out every thing-class instance with >= min_points points,
store them under <out>/instances_in_sequences + instance_path.pkl for the
SegInstanceAug pipeline transform.

Usage: python tools/instance_preprocess.py --data_path DATA/sequences \\
           --out_path DATA [--min_points 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_SEQ = ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True,
                   help="SemanticKITTI sequences root")
    p.add_argument("--out_path", required=True)
    p.add_argument("--min_points", type=int, default=10)
    args = p.parse_args()

    from lidarseg3d_tpu.datasets.semantickitti.dataset import (
        SemanticKITTIDataset,
    )

    ds = SemanticKITTIDataset(
        root_path=args.data_path, sequences=TRAIN_SEQ, test_mode=False,
    )
    pkl = ds.save_instance(args.out_path, min_points=args.min_points)
    print(f"instance library written: {pkl}")


if __name__ == "__main__":
    main()
