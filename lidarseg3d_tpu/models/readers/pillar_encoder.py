"""PointPillars pillar encoder (PFN) + dense BEV scatter.

Re-implements /root/reference/det3d/models/readers/pillar_encoder.py:15-200
on the padded [B, V, P, D] voxel layout: per-point decorations (cluster
offset, pillar-center offset, optional distance), PFN layers
(Linear -> BN -> ReLU -> max over points, with max-broadcast concat for
non-final layers), then a scatter of pillar features onto the [ny, nx] BEV
canvas (PointPillarsScatter).

BN semantics: the reference normalizes over every point slot of REAL
pillars (padded point slots are zeroed but included); here that is a
MaskedBatchNorm with the pillar-validity mask broadcast over P, which also
excludes the capacity-padding pillar rows the reference doesn't have.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm, TorchLinear
from ..registry import BACKBONES, READERS


class PFNLayer(nn.Module):
    out_channels: int
    last_layer: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, x, point_mask, voxel_mask, train: bool = True):
        """x: [B, V, P, Cin]; point_mask: [B, V, P]; voxel_mask: [B, V]."""
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = TorchLinear(units, use_bias=False)(x)
        bn_mask = jnp.broadcast_to(voxel_mask[:, :, None], x.shape[:3])
        x = MaskedBatchNorm(eps=self.bn_eps, momentum=self.bn_momentum)(
            x, mask=bn_mask, train=train
        )
        x = jax.nn.relu(x)
        x = x * point_mask[..., None]
        x_max = jnp.max(x, axis=2, keepdims=True)  # [B, V, 1, units]
        if self.last_layer:
            return x_max[:, :, 0, :]
        x_rep = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_rep], axis=-1)


@READERS.register_module
class PillarFeatureNet(nn.Module):
    num_input_features: int = 4
    num_filters: tuple = (64,)
    with_distance: bool = False
    voxel_size: tuple = (0.2, 0.2, 4)
    pc_range: tuple = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: dict = None

    @nn.compact
    def __call__(self, voxels, num_points, coordinates, train: bool = True):
        """voxels [B, V, P, D]; num_points [B, V]; coordinates [B, V, 3]
        (z, y, x). Returns pillar features [B, V, C]."""
        B, V, P, D = voxels.shape
        vmask = num_points > 0
        pmask = (
            jnp.arange(P, dtype=jnp.int32)[None, None, :]
            < num_points[:, :, None]
        )
        n = jnp.maximum(num_points, 1).astype(voxels.dtype)[:, :, None]

        xyz = voxels[..., :3]
        mean = jnp.sum(xyz * pmask[..., None], axis=2, keepdims=True) / n[
            ..., None]
        f_cluster = xyz - mean

        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        x_off = vx / 2 + float(self.pc_range[0])
        y_off = vy / 2 + float(self.pc_range[1])
        cx = coordinates[..., 2].astype(voxels.dtype) * vx + x_off
        cy = coordinates[..., 1].astype(voxels.dtype) * vy + y_off
        f_center = jnp.stack(
            [voxels[..., 0] - cx[:, :, None], voxels[..., 1] - cy[:, :, None]],
            axis=-1,
        )

        feats = [voxels, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * pmask[..., None]

        filters = list(self.num_filters)
        for i, f in enumerate(filters):
            x = PFNLayer(f, last_layer=(i == len(filters) - 1))(
                x, pmask, vmask, train=train
            )
        return x * vmask[..., None]  # [B, V, C]


@BACKBONES.register_module
class PointPillarsScatter(nn.Module):
    """Scatter pillar features to the dense BEV canvas [B, ny, nx, C]
    (pillar_encoder.py:157-200; NHWC for the RPN neck)."""

    num_input_features: int = 64
    norm_cfg: dict = None

    @nn.compact
    def __call__(self, pillar_features, coordinates, num_voxels, input_shape,
                 train: bool = True):
        """pillar_features [B, V, C]; coordinates [B, V, 3] (z, y, x);
        input_shape: (nz, ny, nx) with nz == 1 (or (ny, nx))."""
        if len(input_shape) == 3:
            ny, nx = int(input_shape[1]), int(input_shape[2])
        else:
            ny, nx = int(input_shape[0]), int(input_shape[1])
        B, V, C = pillar_features.shape
        valid = (
            jnp.arange(V, dtype=jnp.int32)[None, :] < num_voxels[:, None]
        )
        cell = coordinates[..., 1] * nx + coordinates[..., 2]
        offs = (jnp.arange(B, dtype=jnp.int32) * (ny * nx))[:, None]
        tgt = jnp.where(valid, cell + offs, B * ny * nx).reshape(-1)
        canvas = jnp.zeros((B * ny * nx + 1, C), pillar_features.dtype)
        canvas = canvas.at[tgt].set(pillar_features.reshape(-1, C))
        return canvas[:-1].reshape(B, ny, nx, C)