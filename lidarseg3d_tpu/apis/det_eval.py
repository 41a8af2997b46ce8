"""Detection evaluation loop: batched inference -> per-frame box dicts.

Counterpart of apis/eval.py for the CenterPoint detection family
(cf. tools/dist_test.py:197-243 with detection predictions): runs the
jitted forward + decode (rotated or circle NMS per test_cfg), fetches the
static [max_out] box sets per frame, and returns {token: {box3d_lidar,
scores, label_preds, valid[, velocity]}} ready for
datasets/waymo/det_submission.write_detection_objects or
datasets/nuscenes/det_submission.detections_to_nusc_json.
"""

import pickle

import jax
import numpy as np

from ..datasets.batching import pad_batch_rows
from ..parallel import mesh as mesh_lib
from .train import example_to_device


def run_det_eval(model, state, loader, input_shape, logger=None,
                 test_cfg=None):
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size

    @jax.jit
    def step(state, batch):
        ex = dict(batch)
        ex["input_shape"] = input_shape
        rets, bat = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ex, train=False)
        out = model.predict(rets, bat, test_cfg)
        keep = {k: out[k] for k in
                ("box3d_lidar", "scores", "label_preds", "valid")}
        if "velocity" in out:
            keep["velocity"] = out["velocity"]
        return keep

    # double-flip TTA: 4 batch rows (flip variants) merge into ONE
    # prediction row, and variants share their frame's metadata
    stride = 4 if (test_cfg or {}).get("double_flip") else 1

    detections = {}
    for it, batch in enumerate(loader.epoch(0)):
        if stride > 1:
            assert len(batch["metadata"]) % stride == 0, (
                "double_flip batches must hold whole groups of 4 variants")
        # pad to a multiple of n_dev*stride so each device shard holds
        # whole flip groups
        dev_batch = example_to_device(
            pad_batch_rows(batch, n_dev * stride), mesh)
        out = mesh_lib.fetch_local_rows(step(state, dev_batch))
        for b, md in enumerate(batch["metadata"][::stride]):
            token = (md or {}).get("token", f"frame_{it}_{b}")
            det = {
                "box3d_lidar": np.asarray(out["box3d_lidar"][b]),
                "scores": np.asarray(out["scores"][b]),
                "label_preds": np.asarray(out["label_preds"][b]),
                "valid": np.asarray(out["valid"][b]),
            }
            if "velocity" in out:
                det["velocity"] = np.asarray(out["velocity"][b])
            detections[token] = det
        if logger is not None and (it + 1) % 20 == 0:
            logger.info(f"det eval: {len(detections)} frames")
    return detections


def save_detections(detections, path):
    with open(path, "wb") as f:
        pickle.dump(detections, f)
    return path
