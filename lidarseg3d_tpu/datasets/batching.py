"""Assemble padded, fixed-capacity device batches from per-frame host data.

Replaces the reference's ragged concat collate
(/root/reference/det3d/torchie/parallel/collate.py:95-175) with static-shape
[B, V, ...] / [B, N, ...] padding — the TPU-native layout (SURVEY.md §7.1).
"""

import numpy as np


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


def collate_segnet(frames, max_voxels, max_points, ignore_label=0):
    """frames: list of per-frame dicts from the pipeline with keys
    voxels [v,P,D], coordinates [v,3] zyx, num_points_per_voxel [v],
    points [n,D], and optionally voxel_sem_labels [v] / point_sem_labels [n].

    Returns a dict of stacked numpy arrays (B leading).
    """
    B = len(frames)
    has_voxels = "voxels" in frames[0]
    out = {"points": [], "num_points_total": []}
    if has_voxels:
        out.update({"voxels": [], "coordinates": [], "num_points": [],
                    "num_voxels": []})
    has_labels = "voxel_sem_labels" in frames[0]
    has_plabels = "point_sem_labels" in frames[0]
    if has_labels:
        out["voxel_sem_labels"] = []
    if has_plabels:
        out["point_sem_labels"] = []
    has_images = "images" in frames[0]
    if has_images:
        out["images"] = []
        out["points_cuv"] = []
        if "images_sem_labels" in frames[0]:
            out["images_sem_labels"] = []
    metadata = []

    for fr in frames:
        n = min(fr["points"].shape[0], max_points)
        if has_voxels:
            v = min(fr["voxels"].shape[0], max_voxels)
            out["voxels"].append(pad_axis0(fr["voxels"], max_voxels))
            out["coordinates"].append(
                pad_axis0(np.asarray(fr["coordinates"], np.int32), max_voxels,
                          fill=-1)
            )
            out["num_points"].append(
                pad_axis0(np.asarray(fr["num_points_per_voxel"], np.int32),
                          max_voxels)
            )
            out["num_voxels"].append(np.int32(v))
        out["points"].append(pad_axis0(np.asarray(fr["points"], np.float32), max_points))
        out["num_points_total"].append(np.int32(n))
        if has_images:
            out["images"].append(fr["images"])
            cuv = pad_axis0(np.asarray(fr["points_cuv"], np.float32), max_points)
            out["points_cuv"].append(cuv)
            if "images_sem_labels" in fr:
                out["images_sem_labels"].append(
                    np.asarray(fr["images_sem_labels"], np.int32)
                )
        if has_labels:
            out["voxel_sem_labels"].append(
                pad_axis0(
                    np.asarray(fr["voxel_sem_labels"], np.int32), max_voxels,
                    fill=ignore_label,
                )
            )
        if has_plabels:
            out["point_sem_labels"].append(
                pad_axis0(
                    np.asarray(fr["point_sem_labels"], np.int32), max_points,
                    fill=ignore_label,
                )
            )
        metadata.append(fr.get("metadata"))

    batch = {
        k: (np.concatenate(v, axis=0) if k == "images_sem_labels"
            else np.stack(v))
        for k, v in out.items()
    }  # images_sem_labels: [B*ncam, H, W]
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
