"""Self-calibrated convolution (SCNet) blocks for the image head.

Re-implements /root/reference/det3d/models/img_heads/sc_conv.py:8-121 in
flax/NHWC: SCConv computes a low-resolution calibration gate
sigmoid(x + up(conv(avgpool_r(x)))) that modulates a parallel 3x3 branch,
and SCBottleneck splits channels into a plain-k1 path and an SCConv path
(FCNMSeg3DHead use_sc_conv=True option, fcn_mseg3d_head.py:100-113).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm
from ..img_backbones.hrnet import conv
from ...ops.resize import resize_bilinear


class SCConv(nn.Module):
    planes: int
    pooling_r: int = 4

    @nn.compact
    def __call__(self, x, train):
        identity = x
        # k2: avgpool_r -> conv3x3 -> BN, upsampled back
        r = self.pooling_r
        pooled = nn.avg_pool(x, (r, r), strides=(r, r))
        k2 = conv(self.planes, 3, dtype=x.dtype)(pooled)
        k2 = MaskedBatchNorm()(k2, train=train)
        k2 = resize_bilinear(k2, (x.shape[1], x.shape[2]))
        gate = jax.nn.sigmoid(identity + k2)
        # k3 gated, then k4
        k3 = conv(self.planes, 3, dtype=x.dtype)(x)
        k3 = MaskedBatchNorm()(k3, train=train)
        out = k3 * gate
        out = conv(self.planes, 3, dtype=x.dtype)(out)
        out = MaskedBatchNorm()(out, train=train)
        return out


class SCBottleneck(nn.Module):
    planes: int
    bottleneck_width: int = 32
    pooling_r: int = 4

    @nn.compact
    def __call__(self, x, train):
        group_width = int(self.planes * (self.bottleneck_width / 64.0))
        residual = x

        a = conv(group_width, 1, dtype=x.dtype)(x)
        a = MaskedBatchNorm()(a, train=train)
        a = jax.nn.relu(a)
        b = conv(group_width, 1, dtype=x.dtype)(x)
        b = MaskedBatchNorm()(b, train=train)
        b = jax.nn.relu(b)

        a = conv(group_width, 3, dtype=x.dtype)(a)
        a = MaskedBatchNorm()(a, train=train)
        a = jax.nn.relu(a)
        b = SCConv(group_width, pooling_r=self.pooling_r)(b, train)
        b = jax.nn.relu(b)

        out = conv(self.planes, 1, dtype=x.dtype)(jnp.concatenate([a, b], axis=-1))
        out = MaskedBatchNorm()(out, train=train)
        return jax.nn.relu(out + residual)
