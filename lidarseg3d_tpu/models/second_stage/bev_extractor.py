"""Second-stage BEV feature extraction at proposal centers.

Re-implements /root/reference/det3d/models/second_stage/bird_eye_view.py:10:
bilinear interpolation of the (stride-8) BEV feature map at each proposal's
center — or at 5 points (center + 4 side midpoints) when num_point == 5 —
fully batched (the reference loops over the batch; here it's one vmap).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import SECOND_STAGE


def bilinear_interpolate(fmap, xs, ys):
    """fmap [H, W, C]; xs, ys [N] continuous pixel coords. Torch-parity
    clamped bilinear (center_utils.bilinear_interpolate_torch)."""
    H, W, C = fmap.shape
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fa = fmap[y0, x0]
    fb = fmap[y1, x0]
    fc = fmap[y0, x1]
    fd = fmap[y1, x1]
    wa = (x1 - xs) * (y1 - ys)
    wb = (x1 - xs) * (ys - y0)
    wc = (xs - x0) * (y1 - ys)
    wd = (xs - x0) * (ys - y0)
    return (fa * wa[:, None] + fb * wb[:, None] + fc * wc[:, None]
            + fd * wd[:, None])


def box_sample_points(boxes, num_point):
    """[B, N, 7] -> [B, N*num_point, 3] sample locations (center or center +
    front/back/left/right midpoints, two_stage.py:49-77)."""
    if num_point == 1:
        return boxes[..., :3]
    cx, cy, z = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    dx, dy = boxes[..., 3], boxes[..., 4]
    ry = boxes[..., 6]
    c, s = jnp.cos(ry), jnp.sin(ry)
    # axis-aligned midpoint offsets rotated by ry
    offs = [(dx / 2, 0.0 * dx), (-dx / 2, 0.0 * dx),
            (0.0 * dy, dy / 2), (0.0 * dy, -dy / 2)]
    pts = [jnp.stack([cx, cy, z], -1)]
    for ox, oy in offs:
        px = cx + ox * c - oy * s
        py = cy + ox * s + oy * c
        pts.append(jnp.stack([px, py, z], -1))
    return jnp.concatenate(pts, axis=1)  # [B, 5N, 3]


@SECOND_STAGE.register_module
class BEVFeatureExtractor(nn.Module):
    pc_start: tuple = ()
    voxel_size: tuple = ()
    out_stride: int = 8

    @nn.compact
    def __call__(self, bev_feature, centers):
        """bev_feature [B, H, W, C]; centers [B, M, 3] -> [B, M, C]."""
        xs = (centers[..., 0] - self.pc_start[0]) / self.voxel_size[0] \
            / self.out_stride
        ys = (centers[..., 1] - self.pc_start[1]) / self.voxel_size[1] \
            / self.out_stride
        return jax.vmap(bilinear_interpolate)(bev_feature, xs, ys)
