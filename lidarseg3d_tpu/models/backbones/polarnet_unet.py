"""PolarNet BEV UNet backbone.

Re-implements /root/reference/det3d/models/backbones/polarnet_backbone.py:
a 2D UNet (64-128-256-512-512, bilinear upsampling) over the polar BEV grid
with circular padding along the azimuth axis, LeakyReLU + BN, DropBlock on
the decoder, and an n_class*n_height 1x1 output head reshaped to
[B, n_class, R, P, Z]-style logits (kept NHWC here: [B, R, P, Z, n_class]).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm
from ..registry import BACKBONES
from ...ops.resize import resize_bilinear


def circular_pad_phi(x):
    """NHWC [B, R, P, C]: wrap-pad the phi (W) axis by 1, zero-pad R by 1."""
    x = jnp.concatenate([x[:, :, -1:], x, x[:, :, :1]], axis=2)
    return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))


class DropBlock2D(nn.Module):
    """DropBlock (Ghiasi et al.): drop contiguous blocks of the feature map."""

    drop_prob: float = 0.5
    block_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.drop_prob == 0.0:
            return x
        B, H, W, C = x.shape
        gamma = (
            self.drop_prob / (self.block_size ** 2)
            * (H * W) / max((H - self.block_size + 1) * (W - self.block_size + 1), 1)
        )
        rng = self.make_rng("dropout")
        seeds = jax.random.bernoulli(rng, gamma, (B, H, W, 1)).astype(x.dtype)
        block = nn.max_pool(
            seeds, (self.block_size, self.block_size), strides=(1, 1),
            padding="SAME",
        )
        keep = 1.0 - block
        scale = keep.size / jnp.maximum(keep.sum(), 1.0)
        return x * keep * scale


class DoubleConvCircular(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = circular_pad_phi(x)
            x = nn.Conv(self.features, (3, 3), padding="VALID")(x)
            x = MaskedBatchNorm()(x, train=train)
            x = nn.leaky_relu(x, 0.01)
        return x


@BACKBONES.register_module
class PolarNet_BEV_Unet(nn.Module):
    n_class: int = 17
    n_height: int = 32
    input_batch_norm: bool = True
    dropout: float = 0.5
    circular_padding: bool = True
    use_vis_fea: bool = False

    @nn.compact
    def __call__(self, bev, train: bool = True):
        """bev: [B, R, P, n_height] -> logits [B, R, P, n_height, n_class]."""
        x = bev
        if self.input_batch_norm:
            x = MaskedBatchNorm()(x, train=train)
        x1 = DoubleConvCircular(64)(x, train)
        x2 = DoubleConvCircular(128)(nn.max_pool(x1, (2, 2), (2, 2)), train)
        x3 = DoubleConvCircular(256)(nn.max_pool(x2, (2, 2), (2, 2)), train)
        x4 = DoubleConvCircular(512)(nn.max_pool(x3, (2, 2), (2, 2)), train)
        x5 = DoubleConvCircular(512)(nn.max_pool(x4, (2, 2), (2, 2)), train)

        def up(a, b, feat):
            B, H, W, C = a.shape
            a = resize_bilinear(a, (b.shape[1], b.shape[2]))
            y = DoubleConvCircular(feat)(jnp.concatenate([b, a], -1), train)
            return DropBlock2D(self.dropout)(y, train)

        y = up(x5, x4, 256)
        y = up(y, x3, 128)
        y = up(y, x2, 64)
        y = up(y, x1, 64)
        logits = nn.Conv(self.n_class * self.n_height, (1, 1))(y)
        B, R, P, _ = logits.shape
        return logits.reshape(B, R, P, self.n_height, self.n_class)
