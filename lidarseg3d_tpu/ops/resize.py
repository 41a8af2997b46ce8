"""Fast exact bilinear resize for integer power-of-two upscales (TPU).

`jax.image.resize(..., "bilinear")` lowers each axis to a dense
[out, in] weight-matrix contraction — a GEMM with K = in_size and tiny
arithmetic intensity that lands on the MXU with single-digit lane
utilization. At HRNet fuse / FCN resize-concat shapes (upsampling 18-144
channel maps by 2x/4x/8x, reference det3d/models/img_backbones/hrnet.py:160
and det3d/models/img_heads/fcn_mseg3d_head.py resize-concat) this is pure
overhead.

For an integer scale s = 2^k with half-pixel sampling (the
align_corners=False convention jax.image.resize and torch
F.interpolate(bilinear) share), every output row o = s*i + r is a fixed
two-tap blend of input rows i-1, i or i, i+1:

    src(o) = (o + 0.5)/s - 0.5 = i + d_r,   d_r = (2r + 1 - s) / (2s)
    d_r < 0:  out[o] = -d_r * x[i-1] + (1 + d_r) * x[i]
    d_r >= 0: out[o] = (1 - d_r) * x[i] + d_r * x[i+1]

(edges clamp, exactly like jax.image.resize which clamps sample
coordinates). That is s shifted FMAs per axis — elementwise VPU work that
XLA fuses into the surrounding graph — instead of a GEMM. Exactness vs
jax.image.resize is pinned by tests/test_resize.py.
"""

import jax
import jax.numpy as jnp


def _axis_phases(x, axis, offsets):
    """Two-tap blends of x with its clamped axis neighbours, one tensor per
    fractional offset d in ``offsets`` (|d| < 1): d<0 blends towards the
    previous element, d>=0 towards the next (edges clamp)."""
    xm = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)
    xp = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                              axis=axis)],
        axis=axis)
    phases = []
    for d in offsets:
        if d < 0:
            y = x + jnp.asarray(-d, x.dtype) * (xm - x)
        else:
            y = x + jnp.asarray(d, x.dtype) * (xp - x)
        phases.append(y)
    return phases


def _interleave_axis(phases, axis, in_size):
    """Stack per-phase tensors along a new minor axis and flatten:
    out[s*i + r] = phases[r][i] along ``axis``."""
    if len(phases) == 1:
        return phases[0]
    y = jnp.stack(phases, axis=axis + 1)  # [..., in, s, ...]
    new_shape = list(phases[0].shape)
    new_shape[axis] = in_size * len(phases)
    return y.reshape(new_shape)


def _upsample_axis_pow2(x, axis, s):
    """Upsample one spatial axis of x by integer factor s (power of two)."""
    if s == 1:
        return x
    offsets = [(2 * r + 1 - s) / (2 * s) for r in range(s)]
    return _interleave_axis(_axis_phases(x, axis, offsets), axis,
                            x.shape[axis])


def upsample_into_s2d(x, s):
    """Bilinear-upsample NHWC x by pow-2 factor s >= 2 directly INTO
    space-to-depth(2) layout: returns [N, H*s/2, W*s/2, 4C] equal to
    space_to_depth(resize_bilinear(x, (H*s, W*s))) with channel order
    (sub_y*2 + sub_x)*C + c (img_backbones/hrnet.py layout).

    Output row o = s*i + r lands at s2d row (s/2)*i + r//2, sub-row
    r % 2 — so for each sub-row t the s2d rows are the interleave of the
    s/2 phases r = 2p + t. No full-resolution [H*s, W*s, C] intermediate
    is ever materialized; for s=2 it is a pure channel-concat of the 4
    phase blends."""
    assert s >= 2 and (s & (s - 1)) == 0
    H, W = x.shape[1], x.shape[2]

    def sub_offsets(t):
        return [(2 * (2 * p + t) + 1 - s) / (2 * s) for p in range(s // 2)]

    rows = [_interleave_axis(_axis_phases(x, 1, sub_offsets(t)), 1, H)
            for t in range(2)]  # each [N, H*s/2, W, C]
    quads = []
    for ty in range(2):
        cols = [_interleave_axis(_axis_phases(rows[ty], 2, sub_offsets(t)),
                                 2, W) for t in range(2)]
        quads.extend(cols)  # order (ty*2 + tx)
    return jnp.concatenate(quads, axis=-1)


def _pow2_factor(out_size, in_size):
    """out/in if it is an integer power of two >= 1, else None."""
    if in_size <= 0 or out_size % in_size:
        return None
    s = out_size // in_size
    return s if (s & (s - 1)) == 0 else None


def resize_bilinear(x, out_hw):
    """Bilinear-resize NHWC x to spatial out_hw (exact jax.image.resize
    semantics); uses the fast shifted-FMA path for power-of-two upscales
    and falls back to jax.image.resize otherwise."""
    H, W = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (H, W):
        return x
    sh, sw = _pow2_factor(oh, H), _pow2_factor(ow, W)
    if sh is None or sw is None:
        return jax.image.resize(
            x, (x.shape[0], oh, ow, x.shape[3]), "bilinear")
    y = _upsample_axis_pow2(x, 1, sh)
    return _upsample_axis_pow2(y, 2, sw)
