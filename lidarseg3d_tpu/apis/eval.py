"""Evaluation loop: batched inference -> per-frame predictions -> dataset
mIoU (cf. tools/dist_test.py:79-243 and trainer.val, trainer.py:436-492).

TTA merging: variants of one frame arrive as consecutive batch rows
(SegCompoundAug emits them in order); softmax outputs are arithmetically
averaged before argmax (point_seg_batchloss_head.py:190-245,
merge_type="ArithmeticMean").

Multi-host: each process fetches only ITS batch rows
(mesh_lib.fetch_local_rows) and the final confusion histogram is allreduced
across hosts (datasets call parallel.dist.allreduce_hist) — a [C, C] array
instead of the reference's pickled per-point all_gather
(torchie/trainer/utils.py:114-153). run_eval_device_hist keeps even the
histogram on device: XLA psums it across all chips inside the jit step.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.seg_metrics import confusion_hist_jax, per_class_iou
from ..datasets.batching import pad_batch_rows
from ..parallel import mesh as mesh_lib
from .train import example_to_device, make_eval_step


def run_eval(
    model, state, loader, input_shape, dataset, logger=None, test_cfg=None,
    speed_test=False,
):
    mesh = mesh_lib.make_mesh()
    tta = bool(test_cfg and test_cfg.get("tta_flag", False))
    num_tta = int(test_cfg.get("num_tta_tranforms", 4)) if tta else 1
    # fetch ONLY what the merge path consumes: the [B,N,C] fp32 softmax
    # (~11 MB/frame over the axon relay) is needed for TTA averaging only;
    # plain eval moves just the int32 label rows (<0.5 MB/frame). Selecting
    # keys inside the jit lets XLA dead-code-eliminate the rest.
    base_step = make_eval_step(model, input_shape)
    keys = ("point_softmax",) if tta else ("pred_point_sem_labels",)
    eval_step = jax.jit(
        lambda state, batch: {k: base_step(state, batch)[k] for k in keys})

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
            fut = eval_step(state, dev_batch)  # async dispatch
            if prev is not None:
                yield prev
            prev = (batch, fut)
        if prev is not None:
            yield prev

    def timed_preds():
        """Unpipelined: one batch in flight, dispatch->ready timed per batch
        (p50 latency parity with the reference --speed_test,
        tools/dist_test.py:189-230). Collate of the NEXT batch never hides
        inside the timed window."""
        for batch in loader.epoch(0):
            dev_batch = example_to_device(pad_batch_rows(batch, n_dev), mesh)
            t0 = time.time()
            fut = eval_step(state, dev_batch)
            jax.block_until_ready(fut)
            latencies.append((time.time() - t0) / len(batch["metadata"]))
            yield batch, fut

    for it, (batch, fut) in enumerate(
            timed_preds() if speed_test else batched_preds()):
        pred = mesh_lib.fetch_local_rows(fut)
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
                f"p50 {np.percentile(lat, 50)*1000:.1f} ms (unpipelined)"
            )
    return detections


def run_eval_device_hist(model, state, loader, input_shape, num_classes,
                         logger=None):
    """Fully device-side validation mIoU.

    The jitted step computes the [C, C] confusion histogram of the whole
    (globally sharded) batch on device; XLA reduces it across every chip and
    host, so the only host transfer per batch is C*C ints. Reference
    equivalent: trainer.val + all_gather (dist_test.py:243), redesigned as a
    histogram psum. Returns (miou, per-class iou over classes 1..C-1).
    """
    mesh = mesh_lib.make_mesh()
    eval_fn = make_eval_step(model, input_shape)

    @jax.jit
    def step(state, batch):
        pred = eval_fn(state, batch)
        return confusion_hist_jax(
            pred["pred_point_sem_labels"],
            batch["point_sem_labels"],
            num_classes,
            valid=batch["point_valid"] > 0,
        )

    n_dev = mesh.devices.size
    hist = np.zeros((num_classes, num_classes), np.int64)
    for batch in loader.epoch(0):
        dev_batch = example_to_device(pad_batch_rows(batch, n_dev), mesh)
        hist += np.asarray(jax.device_get(step(state, dev_batch)),
                           dtype=np.int64)
    # reference crop semantics (fast_hist_crop drops the ignore class from
    # both axes): IoU over classes 1..C-1 with ignore-labelled points
    # excluded from every union
    sub = hist[1:, 1:]
    ious = per_class_iou(sub)
    miou = float(np.nanmean(ious))
    if logger is not None:
        logger.info(f"device-hist val mIoU: {miou * 100:.2f}")
    return miou, ious


def evaluate_dataset(dataset, detections, output_dir=None, testset=False,
                     logger=None):
    res, _ = dataset.evaluation(detections, output_dir=output_dir,
                                testset=testset)
    if res is not None and logger is not None:
        for k, v in res["results"].items():
            logger.info(f"{k}: {v:.2f}")
    return res
