"""ResNet image backbone (mmseg-style ResNetV1c).

Alternative camera encoder (cf. det3d/models/img_backbones/resnet_mmcv.py):
deep stem (3x 3x3 convs), 4 stages of Bottleneck/BasicBlock, dilation
support for the last stages, multi-stage outputs.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm
from ..registry import IMG_BACKBONES
from .hrnet import ConvBNReLU, BasicBlock, Bottleneck

ARCH = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


@IMG_BACKBONES.register_module
class ResNetMMCV(nn.Module):
    depth: int = 50
    base_channels: int = 64
    out_indices: tuple = (0, 1, 2, 3)
    frozen_stages: int = -1
    deep_stem: bool = True
    pretrained: str = None
    norm_eval: bool = False
    compute_dtype: str = None  # mixed-precision activations (see hrnet.conv)

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_type, blocks = ARCH[self.depth]
        if self.compute_dtype is not None:
            x = x.astype(jnp.dtype(self.compute_dtype))
        t0 = train and self.frozen_stages < 0
        c = self.base_channels
        if self.deep_stem:  # ResNetV1c stem
            x = ConvBNReLU(c // 2, stride=2)(x, t0)
            x = ConvBNReLU(c // 2)(x, t0)
            x = ConvBNReLU(c)(x, t0)
        else:
            x = nn.Conv(c, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=x.dtype)(x)
            x = MaskedBatchNorm()(x, train=t0)
            x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for si, nb in enumerate(blocks):
            ts = train and self.frozen_stages < si + 1
            planes = c * (2 ** si)
            for bi in range(nb):
                stride = 2 if (si > 0 and bi == 0) else 1
                if block_type == "bottleneck":
                    x = Bottleneck(planes, stride=stride)(x, ts)
                else:
                    if stride == 2:
                        x = ConvBNReLU(planes, stride=2)(x, ts)
                    x = BasicBlock(planes)(x, ts)
            if self.frozen_stages >= si + 1:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
        return outs
