"""On-device dynamic voxelization + segment reductions.

TPU-native replacement for torch_scatter's scatter_max/scatter_mean used by
the dynamic VFEs (/root/reference/det3d/models/readers/voxel_encoder.py:
276-720) and for the mmdet3d-style voxel ops package
(det3d/ops/voxel, SURVEY.md §2.4): the voxel set is deduplicated with the
same unique/dense-table machinery as the sparse conv stack, and reductions
are XLA scatter ops over the padded voxel rows.
"""

import jax
import jax.numpy as jnp

from . import coords as coord_ops
from . import sparse as sp


def assign_points_to_voxels(point_coords, point_valid, spatial_shape, capacity):
    """Build the voxel structure from per-point integer grid coords.

    point_coords: [B, N, 3] int32 (z, y, x); point_valid: [B, N] bool.
    Returns (struct, p2v [B, N] int32 local voxel row, found [B, N] bool).
    """
    struct_coords, num, _ = coord_ops.unique_coords(
        point_coords, point_valid, spatial_shape, capacity
    )
    struct = sp.SparseStructure(
        coords=struct_coords, num_voxels=num,
        spatial_shape=tuple(int(s) for s in spatial_shape),
    )
    table = sp.dense_table(struct)
    p2v, found = coord_ops.lookup_coords(
        table, point_coords, spatial_shape, extra_valid=point_valid
    )
    return struct, p2v, found


def _flat_targets(p2v, found, capacity):
    """[B, N] local rows -> flat rows into [B*cap + 1]; misses -> B*cap."""
    B = p2v.shape[0]
    offs = (jnp.arange(B, dtype=jnp.int32) * capacity)[:, None]
    return jnp.where(found, p2v + offs, B * capacity)


def segment_sum(values, p2v, found, capacity):
    """values [B, N, C] -> [B, cap, C] summed per voxel."""
    B, N, C = values.shape
    tgt = _flat_targets(p2v, found, capacity).reshape(-1)
    out = jnp.zeros((B * capacity + 1, C), values.dtype)
    out = out.at[tgt].add(values.reshape(B * N, C))
    return out[:-1].reshape(B, capacity, C)


def segment_mean(values, p2v, found, capacity):
    B, N, C = values.shape
    s = segment_sum(values, p2v, found, capacity)
    ones = jnp.ones((B, N, 1), values.dtype)
    cnt = segment_sum(ones, p2v, found, capacity)
    return s / jnp.maximum(cnt, 1.0)


def segment_max(values, p2v, found, capacity, neg_fill=0.0):
    """Per-voxel max; empty voxels get ``neg_fill``."""
    B, N, C = values.shape
    tgt = _flat_targets(p2v, found, capacity).reshape(-1)
    out = jnp.full((B * capacity + 1, C), -jnp.inf, values.dtype)
    out = out.at[tgt].max(values.reshape(B * N, C))
    out = out[:-1].reshape(B, capacity, C)
    return jnp.where(jnp.isfinite(out), out, neg_fill)


def segment_label_vote(labels, p2v, found, capacity, num_classes):
    """Majority-vote voxel labels (voxel_encoder.py:391 voxelize_labels).

    labels: [B, N] int32 (already train ids). Returns [B, cap] int32;
    empty voxels get 0.
    """
    B, N = labels.shape
    tgt = _flat_targets(p2v, found, capacity).reshape(-1)
    cls = jnp.clip(labels.reshape(-1), 0, num_classes - 1)
    hist = jnp.zeros((B * capacity + 1, num_classes), jnp.int32)
    hist = hist.at[tgt, cls].add(1)
    hist = hist[:-1].reshape(B, capacity, num_classes)
    return jnp.argmax(hist, axis=-1).astype(jnp.int32)


def cart2cylind(points_xyz):
    """[..., 3] (x, y, z) -> (rho, phi, z) (voxel_encoder.py:11-17)."""
    rho = jnp.sqrt(points_xyz[..., 0] ** 2 + points_xyz[..., 1] ** 2)
    phi = jnp.arctan2(points_xyz[..., 1], points_xyz[..., 0])
    return jnp.stack([rho, phi, points_xyz[..., 2]], axis=-1)


def grid_coords_from_metric(points, lower, upper, grid_size):
    """metric coords [..., 3] -> int grid coords [..., 3] + in-bounds mask.

    Matches the dynamic VFEs' clip-free binning: floor((p - lo) / interval),
    out-of-range points masked out. Axis order of the OUTPUT follows the
    input metric axes (caller reorders to zyx)."""
    lo = jnp.asarray(lower, jnp.float32)
    up = jnp.asarray(upper, jnp.float32)
    gs = jnp.asarray(grid_size, jnp.float32)
    interval = (up - lo) / gs
    c = jnp.floor((points - lo) / interval)
    inb = jnp.all((c >= 0) & (c < gs), axis=-1)
    return c.astype(jnp.int32), inb
