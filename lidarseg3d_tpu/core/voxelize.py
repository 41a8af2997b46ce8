"""Host-side hard voxelization + voxel label encoding (vectorized numpy).

Semantics match the reference numba kernels:
- ``points_to_voxel`` reproduces
  /root/reference/det3d/ops/point_cloud/point_cloud_ops.py:8-111
  (reverse zyx coords, first-occurrence voxel order, first ``max_points``
  points kept per voxel, voxels beyond ``max_voxels`` dropped while points
  in already-created voxels still accumulate).
- label encoders reproduce
  /root/reference/det3d/datasets/pipelines/segpreprocess.py:265-326
  (labels arrive +1-shifted so 0 marks padding; output is shifted back).

These run in dataloader workers; the on-device dynamic voxelizer lives in
``lidarseg3d_tpu.ops.dynamic_voxel``.
"""

import numpy as np


def compute_grid_size(point_cloud_range, voxel_size):
    pc_range = np.asarray(point_cloud_range, dtype=np.float32)
    vsize = np.asarray(voxel_size, dtype=np.float32)
    return np.round((pc_range[3:] - pc_range[:3]) / vsize).astype(np.int64)


def points_to_voxel(points, voxel_size, coors_range, max_points=35,
                    max_voxels=20000, sort_by_key=False):
    """Hard-voxelize a point cloud.

    Args:
        points: [N, D] float array; xyz in the first 3 columns.
        voxel_size: [3] xyz voxel edge lengths.
        coors_range: [6] xyzxyz min/max extents.
        max_points: max points stored per voxel.
        max_voxels: max number of voxels created.

    Returns:
        voxels: [M, max_points, D] float (zero padded).
        coors: [M, 3] int32 voxel coords in **zyx** order.
        num_points_per_voxel: [M] int32.
    """
    points = np.asarray(points)
    voxel_size = np.asarray(voxel_size, dtype=np.float32)
    coors_range = np.asarray(coors_range, dtype=np.float32)
    grid_size = compute_grid_size(coors_range, voxel_size)  # xyz

    c = np.floor((points[:, :3] - coors_range[:3]) / voxel_size).astype(np.int64)
    in_range = np.all((c >= 0) & (c < grid_size[None, :]), axis=1)
    pidx = np.nonzero(in_range)[0]
    c = c[pidx]

    if len(pidx) == 0:
        return (
            np.zeros((0, max_points, points.shape[1]), dtype=points.dtype),
            np.zeros((0, 3), dtype=np.int32),
            np.zeros((0,), dtype=np.int32),
        )

    # linear key over (z, y, x)
    key = (c[:, 2] * grid_size[1] + c[:, 1]) * grid_size[0] + c[:, 0]

    if sort_by_key:
        # Fast path (the production default): the output is key-sorted, so
        # skip the first-occurrence bookkeeping (np.unique + two argsorts +
        # a full reorder copy) and build directly in key order with ONE
        # stable argsort. Semantics differ from the slow path only when the
        # scan overflows max_voxels: truncation keeps the smallest keys
        # here vs the earliest-seen voxels there; both are arbitrary
        # subsets, and at the production capacities overflow is rare.
        #
        # When the C voxelizer is available (native/voxelize.c, radix
        # sort) it serves this path byte-identically at a fraction of the
        # cost; the numpy code below stays as the semantic reference.
        if points.dtype == np.float32:
            from . import native_voxelize

            out = native_voxelize.points_to_voxel_native(
                points, voxel_size, coors_range, max_points, max_voxels,
                grid_size)
            if out is not None:
                return out
        sort_idx = np.argsort(key, kind="stable")
        skey = key[sort_idx]
        n = len(skey)
        new = np.empty(n, dtype=bool)
        new[0] = True
        np.not_equal(skey[1:], skey[:-1], out=new[1:])
        vox_sorted = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        n_uniq = len(starts)
        num_vox = min(n_uniq, max_voxels)
        rank_sorted = np.arange(n) - starts[vox_sorted]
        keep = (vox_sorted < num_vox) & (rank_sorted < max_points)
        voxels = np.zeros((num_vox, max_points, points.shape[1]),
                          dtype=points.dtype)
        voxels[vox_sorted[keep], rank_sorted[keep]] = points[
            pidx[sort_idx[keep]]]
        counts = np.diff(np.append(starts, n))
        num_points_per_voxel = np.minimum(
            counts[:num_vox], max_points).astype(np.int32)
        kept_keys = skey[starts[:num_vox]]
        cz = kept_keys // (grid_size[1] * grid_size[0])
        rem = kept_keys % (grid_size[1] * grid_size[0])
        cy = rem // grid_size[0]
        cx = rem % grid_size[0]
        coors = np.stack([cz, cy, cx], axis=1).astype(np.int32)
        return voxels, coors, num_points_per_voxel

    uniq, first_idx, inv, counts = np.unique(
        key, return_index=True, return_inverse=True, return_counts=True
    )
    # voxel order = order of first occurrence in the (possibly shuffled) scan
    occ_order = np.argsort(first_idx, kind="stable")
    rank_of_uniq = np.empty(len(uniq), dtype=np.int64)
    rank_of_uniq[occ_order] = np.arange(len(uniq))
    vox_of_point = rank_of_uniq[inv]

    num_vox = min(len(uniq), max_voxels)

    # rank of each point within its voxel, in scan order
    sort_idx = np.argsort(vox_of_point, kind="stable")
    sorted_vox = vox_of_point[sort_idx]
    counts_by_rank = counts[occ_order]
    starts = np.concatenate([[0], np.cumsum(counts_by_rank)[:-1]])
    rank_sorted = np.arange(len(sorted_vox)) - starts[sorted_vox]

    keep = (sorted_vox < num_vox) & (rank_sorted < max_points)
    kv = sorted_vox[keep]
    kr = rank_sorted[keep]

    voxels = np.zeros((num_vox, max_points, points.shape[1]), dtype=points.dtype)
    voxels[kv, kr] = points[pidx[sort_idx[keep]]]
    num_points_per_voxel = np.minimum(counts_by_rank[:num_vox], max_points).astype(
        np.int32
    )

    kept_keys = uniq[occ_order[:num_vox]]

    cz = kept_keys // (grid_size[1] * grid_size[0])
    rem = kept_keys % (grid_size[1] * grid_size[0])
    cy = rem // grid_size[0]
    cx = rem % grid_size[0]
    coors = np.stack([cz, cy, cx], axis=1).astype(np.int32)
    return voxels, coors, num_points_per_voxel


class VoxelGenerator:
    """API-compatible with the reference VoxelGenerator
    (/root/reference/det3d/core/input/voxel_generator.py:5)."""

    def __init__(self, voxel_size, point_cloud_range, max_num_points,
                 max_voxels=20000, sort_by_key=True):
        self._sort_by_key = sort_by_key
        self._voxel_size = np.array(voxel_size, dtype=np.float32)
        self._point_cloud_range = np.array(point_cloud_range, dtype=np.float32)
        self._max_num_points = max_num_points
        self._max_voxels = max_voxels
        self._grid_size = compute_grid_size(point_cloud_range, voxel_size)

    def generate(self, points, max_voxels=-1):
        if max_voxels == -1:
            max_voxels = self._max_voxels
        return points_to_voxel(
            points,
            self._voxel_size,
            self._point_cloud_range,
            self._max_num_points,
            max_voxels,
            sort_by_key=self._sort_by_key,
        )

    @property
    def voxel_size(self):
        return self._voxel_size

    @property
    def max_num_points_per_voxel(self):
        return self._max_num_points

    @property
    def point_cloud_range(self):
        return self._point_cloud_range

    @property
    def grid_size(self):
        return self._grid_size


def encode_compact_value_labels(voxel_labels, ignore_id=0):
    """Voxel label = the single (+1-shifted) label present, else ignore.

    voxel_labels: [Nv, P] int array, 0 = padding slot. Returns [Nv] labels
    shifted back by -1 (ambiguous voxels -> ignore_id).
    """
    voxel_labels = np.asarray(voxel_labels)
    pos = voxel_labels > 0
    mx = voxel_labels.max(axis=1)
    mixed = np.any(pos & (voxel_labels != mx[:, None]), axis=1)
    enc = np.where(mixed | (mx == 0), ignore_id + 1, mx)
    return (enc - 1).astype(voxel_labels.dtype)


def encode_major_value_labels(voxel_labels, ignore_id=0):
    """Voxel label = majority (+1-shifted) label; ties -> smallest label value.

    Matches nb_encode_major_value_as_label_fast (np.unique + argmax picks the
    smallest label among count ties).
    """
    voxel_labels = np.asarray(voxel_labels)
    pos = voxel_labels > 0
    # counts[i, j] = multiplicity of voxel_labels[i, j] among valid slots
    eq = voxel_labels[:, :, None] == voxel_labels[:, None, :]
    counts = (eq & pos[:, None, :]).sum(axis=2)
    # score favours high count then small label; invalid slots excluded
    score = counts.astype(np.float64) * 1e9 - voxel_labels
    score[~pos] = -np.inf
    best = np.argmax(score, axis=1)
    enc = voxel_labels[np.arange(len(voxel_labels)), best]
    enc = np.where(pos.any(axis=1), enc, ignore_id + 1)
    return (enc - 1).astype(voxel_labels.dtype)
