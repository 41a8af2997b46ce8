"""Evaluation loop: batched inference -> per-frame predictions -> dataset
mIoU (cf. tools/dist_test.py:79-243 and trainer.val, trainer.py:436-492).

TTA merging: variants of one frame arrive as consecutive batch rows
(SegCompoundAug emits them in order); softmax outputs are arithmetically
averaged before argmax (point_seg_batchloss_head.py:190-245,
merge_type="ArithmeticMean").
"""

import time

import jax
import numpy as np

from ..datasets.batching import pad_batch_rows
from ..parallel import mesh as mesh_lib
from .train import example_to_device, make_eval_step


def run_eval(
    model, state, loader, input_shape, dataset, logger=None, test_cfg=None,
    speed_test=False,
):
    mesh = mesh_lib.make_mesh()
    eval_step = jax.jit(make_eval_step(model, input_shape))
    tta = bool(test_cfg and test_cfg.get("tta_flag", False))
    num_tta = int(test_cfg.get("num_tta_tranforms", 4)) if tta else 1

    detections = {}
    latencies = []
    pending = {}  # token -> (softmax accum, count, n_points)
    n_dev = mesh.devices.size

    def batched_preds():
        """One-step pipelining: dispatch batch i+1 before fetching batch i
        (hides the host->device RPC latency behind device compute)."""
        prev = None
        for batch in loader.epoch(0):
            dev_batch = example_to_device(pad_batch_rows(batch, n_dev), mesh)
            t0 = time.time()
            fut = eval_step(state, dev_batch)  # async dispatch
            if prev is not None:
                yield prev
            prev = (batch, fut, t0)
        if prev is not None:
            yield prev

    for it, (batch, fut, t0) in enumerate(batched_preds()):
        pred = jax.device_get(fut)
        dt = time.time() - t0
        latencies.append(dt / len(batch["metadata"]))
        npts = batch["num_points_total"]
        for b, md in enumerate(batch["metadata"]):
            token = md["token"] if md else f"frame_{it}_{b}"
            n = int(npts[b])
            if tta:
                sm = pred["point_softmax"][b, :n]
                acc, cnt = pending.get(token, (0.0, 0))
                acc = acc + sm
                cnt += 1
                if cnt == num_tta:
                    detections[token] = {
                        "pred_point_sem_labels": np.argmax(acc / cnt, axis=-1)
                    }
                    pending.pop(token)
                else:
                    pending[token] = (acc, cnt)
            else:
                detections[token] = {
                    "pred_point_sem_labels": pred["pred_point_sem_labels"][b, :n]
                }
    assert not pending, f"incomplete TTA groups: {list(pending)[:4]}"

    if speed_test and logger is not None:
        lat = np.asarray(latencies[len(latencies) // 3: 2 * len(latencies) // 3])
        if len(lat):
            logger.info(
                f"speed_test: mean {lat.mean()*1000:.1f} ms/frame, "
                f"p50 {np.percentile(lat, 50)*1000:.1f} ms"
            )
    return detections


def evaluate_dataset(dataset, detections, output_dir=None, testset=False,
                     logger=None):
    res, _ = dataset.evaluation(detections, output_dir=output_dir,
                                testset=testset)
    if res is not None and logger is not None:
        for k, v in res["results"].items():
            logger.info(f"{k}: {v:.2f}")
    return res
