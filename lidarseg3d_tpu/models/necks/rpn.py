"""RPN neck for the detection stack.

Re-implements /root/reference/det3d/models/necks/rpn.py:23: downsample
blocks (stride + layer_num convs each) and upsample branches
(ConvTranspose-equivalent), concatenated to the multi-scale BEV feature map.
NHWC layout.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm
from ..registry import NECKS


class ConvBlock(nn.Module):
    features: int
    stride: int
    num_layers: int

    @nn.compact
    def __call__(self, x, train):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        x = MaskedBatchNorm(eps=1e-3, momentum=0.01)(x, train=train)
        x = jax.nn.relu(x)
        for _ in range(self.num_layers):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False)(x)
            x = MaskedBatchNorm(eps=1e-3, momentum=0.01)(x, train=train)
            x = jax.nn.relu(x)
        return x


@NECKS.register_module
class RPN(nn.Module):
    layer_nums: tuple = (5, 5)
    ds_layer_strides: tuple = (1, 2)
    ds_num_filters: tuple = (128, 256)
    us_layer_strides: tuple = (1, 2)
    us_num_filters: tuple = (256, 256)
    num_input_features: int = 256
    norm_cfg: dict = None
    logger: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ups = []
        start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, ln in enumerate(self.layer_nums):
            x = ConvBlock(self.ds_num_filters[i], self.ds_layer_strides[i],
                          ln)(x, train)
            if i - start >= 0:
                stride = self.us_layer_strides[i - start]
                feat = self.us_num_filters[i - start]
                y = x
                if stride > 1:
                    B, H, W, C = y.shape
                    y = nn.ConvTranspose(
                        feat, (stride, stride), strides=(stride, stride),
                        use_bias=False,
                    )(y)
                else:
                    y = nn.Conv(feat, (1, 1), use_bias=False)(y)
                y = MaskedBatchNorm(eps=1e-3, momentum=0.01)(y, train=train)
                y = jax.nn.relu(y)
                ups.append(y)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]
