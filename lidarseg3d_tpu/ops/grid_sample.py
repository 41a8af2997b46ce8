"""Bilinear point-to-pixel feature sampling.

TPU-native replacement for the reference's F.grid_sample trick over a
[B, C, num_cam, h, w] volume (point_seg_mseg3d_head.py:200-236): the camera
index is an exact integer (align_corners=True on the cam axis avoided
cross-camera interpolation), so we gather the 4 bilinear corners per point
from the right camera's feature map with flat 2D takes.
"""

import jax.numpy as jnp


def sample_points_cuv(features, points_cuv):
    """features: [B, num_cam, H, W, C]; points_cuv: [B, N, 4] with columns
    [valid, cam_norm, v_norm, u_norm] in [-1, 1] (align_corners=True
    convention, formed by SegImagePreprocess, segpreprocess.py:649-671).

    Returns [B, N, C]; invalid points get zeros.
    """
    B, num_cam, H, W, C = features.shape
    N = points_cuv.shape[1]
    valid = points_cuv[..., 0] > 0.5
    # denormalize (align_corners=True: -1 -> 0, +1 -> size-1)
    cam = jnp.round((points_cuv[..., 1] + 1.0) * 0.5 * (num_cam - 1)).astype(
        jnp.int32
    ) if num_cam > 1 else jnp.zeros_like(points_cuv[..., 1], jnp.int32)
    v = (points_cuv[..., 2] + 1.0) * 0.5 * (H - 1)
    u = (points_cuv[..., 3] + 1.0) * 0.5 * (W - 1)

    v0 = jnp.clip(jnp.floor(v), 0, H - 1)
    u0 = jnp.clip(jnp.floor(u), 0, W - 1)
    v1 = jnp.clip(v0 + 1, 0, H - 1)
    u1 = jnp.clip(u0 + 1, 0, W - 1)
    wv = v - v0
    wu = u - u0
    v0i, v1i, u0i, u1i = (a.astype(jnp.int32) for a in (v0, v1, u0, u1))

    flat = features.reshape(B * num_cam * H * W, C)
    base = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * (num_cam * H * W)
        + cam * (H * W)
    )  # [B, N]

    def gather(vi, ui):
        idx = (base + vi * W + ui).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(B, N, C)

    out = (
        gather(v0i, u0i) * ((1 - wv) * (1 - wu))[..., None]
        + gather(v0i, u1i) * ((1 - wv) * wu)[..., None]
        + gather(v1i, u0i) * (wv * (1 - wu))[..., None]
        + gather(v1i, u1i) * (wv * wu)[..., None]
    )
    return out * valid[..., None].astype(out.dtype)
