"""Assemble padded, fixed-capacity device batches from per-frame host data.

Replaces the reference's ragged concat collate
(/root/reference/det3d/torchie/parallel/collate.py:95-175) with static-shape
[B, V, ...] / [B, N, ...] padding — the TPU-native layout (SURVEY.md §7.1).
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


def _check_overflow(frames, max_voxels, max_points, on_overflow):
    """Loudly handle frames exceeding the padded capacity.

    The reference's ragged concat never drops rows
    (det3d/torchie/parallel/collate.py:95-175); our fixed-capacity pad
    truncates, so an undersized `capacity` config must not fail silently.
    on_overflow: "error" (train default — truncation changes gradients),
    "warn" (eval/tools default), or "silent" (benchmarks on synthetic
    data sized to capacity).
    """
    if on_overflow == "silent":
        return
    dropped_v = sum(
        max(0, fr["voxels"].shape[0] - max_voxels)
        for fr in frames if "voxels" in fr)
    dropped_p = sum(
        max(0, np.asarray(fr["points"]).shape[0] - max_points)
        for fr in frames)
    if not (dropped_v or dropped_p):
        return
    msg = (
        f"capacity overflow at collate: dropped {dropped_v} voxel rows "
        f"(max_voxels={max_voxels}) and {dropped_p} point rows "
        f"(max_points={max_points}) across {len(frames)} frames; raise "
        f"`capacity` in the config or truncate upstream (npoints/"
        f"max_voxel_num in SegPreprocess/SegVoxelization)")
    if on_overflow == "error":
        raise ValueError(msg)
    logger.warning(msg)


def pad_axis0(arr, size, fill=0):
    """Pad/truncate arr along axis 0 to `size`."""
    n = min(arr.shape[0], size)
    shape = (size,) + arr.shape[1:]
    # np.zeros = calloc (lazily-zeroed pages): measurably cheaper than
    # np.full's explicit fill at 10 MB/frame capacity buffers
    out = (np.zeros(shape, dtype=arr.dtype) if fill == 0
           else np.full(shape, fill, dtype=arr.dtype))
    out[:n] = arr[:n]
    return out


def _pad_stack(arrs, size, dtype, fill=0):
    """Pad each [n, ...] array to `size` rows straight into ONE
    preallocated [B, size, ...] batch array.

    The list-of-pad_axis0 + np.stack formulation copies every padded
    buffer twice; at 10 MB/frame capacities on a 1-vCPU host the second
    copy alone dominated collate (tools/bench/mb_loader_stages.py)."""
    B = len(arrs)
    shape = (B, size) + arrs[0].shape[1:]
    out = (np.zeros(shape, dtype) if fill == 0  # calloc: lazily zeroed
           else np.full(shape, fill, dtype))
    for b, a in enumerate(arrs):
        n = min(a.shape[0], size)
        out[b, :n] = a[:n]
    return out


def collate_segnet(frames, max_voxels, max_points, ignore_label=0,
                   on_overflow="warn"):
    """frames: list of per-frame dicts from the pipeline with keys
    voxels [v,P,D], coordinates [v,3] zyx, num_points_per_voxel [v],
    points [n,D], and optionally voxel_sem_labels [v] / point_sem_labels [n].

    Returns a dict of stacked numpy arrays (B leading). Frames larger than
    the capacity are truncated — loudly, per `on_overflow` ("error" /
    "warn" / "silent").
    """
    _check_overflow(frames, max_voxels, max_points, on_overflow)
    B = len(frames)
    has_voxels = "voxels" in frames[0]
    has_labels = "voxel_sem_labels" in frames[0]
    has_plabels = "point_sem_labels" in frames[0]
    has_images = "images" in frames[0]
    batch = {}

    if has_voxels:
        batch["voxels"] = _pad_stack(
            [fr["voxels"] for fr in frames], max_voxels, np.float32)
        batch["coordinates"] = _pad_stack(
            [np.asarray(fr["coordinates"], np.int32) for fr in frames],
            max_voxels, np.int32, fill=-1)
        batch["num_points"] = _pad_stack(
            [np.asarray(fr["num_points_per_voxel"], np.int32)
             for fr in frames], max_voxels, np.int32)
        batch["num_voxels"] = np.asarray(
            [min(fr["voxels"].shape[0], max_voxels) for fr in frames],
            np.int32)
    batch["points"] = _pad_stack(
        [np.asarray(fr["points"], np.float32) for fr in frames],
        max_points, np.float32)
    batch["num_points_total"] = np.asarray(
        [min(fr["points"].shape[0], max_points) for fr in frames], np.int32)
    if has_images:
        if B == 1:
            # zero-copy: a [1, ncam, H, W, 3] VIEW of the frame's block
            batch["images"] = frames[0]["images"][None]
        else:
            batch["images"] = np.stack([fr["images"] for fr in frames])
        batch["points_cuv"] = _pad_stack(
            [np.asarray(fr["points_cuv"], np.float32) for fr in frames],
            max_points, np.float32)
        if "images_sem_labels" in frames[0]:
            batch["images_sem_labels"] = np.concatenate(
                [np.asarray(fr["images_sem_labels"], np.int32)
                 for fr in frames], axis=0)  # [B*ncam, H, W]
    if has_labels:
        batch["voxel_sem_labels"] = _pad_stack(
            [np.asarray(fr["voxel_sem_labels"], np.int32) for fr in frames],
            max_voxels, np.int32, fill=ignore_label)
    if has_plabels:
        batch["point_sem_labels"] = _pad_stack(
            [np.asarray(fr["point_sem_labels"], np.int32) for fr in frames],
            max_points, np.int32, fill=ignore_label)
    metadata = [fr.get("metadata") for fr in frames]
    batch["point_valid"] = (
        np.arange(max_points)[None, :] < batch["num_points_total"][:, None]
    )
    if has_voxels:
        batch["voxel_valid"] = (
            np.arange(max_voxels)[None, :] < batch["num_voxels"][:, None]
        )
    batch["metadata"] = metadata

    # detection extras: stacked per-task center targets + padded gt boxes
    if "det_targets" in frames[0]:
        ntasks = len(frames[0]["det_targets"])
        batch["det_targets"] = [
            {k: np.stack([fr["det_targets"][t][k] for fr in frames])
             for k in frames[0]["det_targets"][t]}
            for t in range(ntasks)
        ]
    if "gt_boxes_and_cls" in frames[0]:
        batch["gt_boxes_and_cls"] = np.stack(
            [fr["gt_boxes_and_cls"] for fr in frames])
    return batch


def pad_batch_rows(batch, multiple):
    """Pad the batch dim to a multiple of the device count with empty rows
    (num_voxels = 0, all masks False). metadata is NOT padded — consumers
    iterate over metadata to skip dummy rows."""
    B = batch["voxels"].shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return batch
    ncam = batch["images"].shape[1] if "images" in batch else 1
    out = {}
    for k, v in batch.items():
        if k == "metadata":
            out[k] = v
        else:
            p = pad * ncam if k == "images_sem_labels" else pad
            out[k] = np.concatenate(
                [v, np.zeros((p,) + v.shape[1:], dtype=v.dtype)], axis=0
            )
    return out
