"""Segmentation metrics: confusion histogram + per-class IoU.

Numpy versions mirror /root/reference/det3d/core/utils/seg_utils.py:8-23.
The JAX version accumulates the confusion histogram on device so that
multi-host eval reduces a [C, C] array with ``psum`` instead of gathering
per-point predictions (cf. SURVEY.md §2.5 eval-time gather).
"""

import numpy as np
import jax.numpy as jnp


def fast_hist(pred, label, n):
    k = (label >= 0) & (label < n)
    bin_count = np.bincount(n * label[k].astype(int) + pred[k], minlength=n ** 2)
    return bin_count[: n ** 2].reshape(n, n)


def per_class_iou(hist):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))


def fast_hist_crop(output, target, unique_label):
    hist = fast_hist(output.flatten(), target.flatten(), np.max(unique_label) + 2)
    hist = hist[unique_label + 1, :]
    hist = hist[:, unique_label + 1]
    return hist


def confusion_hist_jax(pred, label, num_classes, valid=None):
    """On-device confusion histogram.

    pred, label: int arrays of identical shape. valid: optional bool mask.
    Returns [num_classes, num_classes] int32 with hist[l, p] counts.
    """
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    ok = (label >= 0) & (label < num_classes) & (pred >= 0) & (pred < num_classes)
    if valid is not None:
        ok = ok & valid.reshape(-1)
    idx = jnp.where(ok, label * num_classes + pred, num_classes * num_classes)
    hist = jnp.zeros((num_classes * num_classes + 1,), dtype=jnp.int32)
    hist = hist.at[idx].add(1)
    return hist[:-1].reshape(num_classes, num_classes)


def miou_from_hist(hist, ignore_class=0):
    """Reference-style mIoU: per-class IoU over all classes except ignore."""
    hist = np.asarray(hist, dtype=np.float64)
    iou = per_class_iou(hist)
    keep = [c for c in range(hist.shape[0]) if c != ignore_class]
    vals = iou[keep]
    return float(np.nanmean(vals)), iou
