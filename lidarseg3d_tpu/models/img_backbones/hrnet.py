"""HRNetV2 image backbone.

Re-implements the mmseg-style HRNet used by MSeg3D
(/root/reference/det3d/models/img_backbones/hrnet.py:229, configured by
configs/*/MSeg3D/hrnet_cfg.py): stem (2x stride-2 3x3), Bottleneck stage1,
multi-resolution parallel branches with fully-connected fusion, w18/w48
width configs. NHWC layout; explicit (1,1) padding matches torch conv
arithmetic so pretrained torch weights can be imported 1:1
(see tools/convert_hrnet_checkpoint.py).

frozen_stages semantics (mmcv): stages <= frozen_stages use running BN stats
and contribute no gradients (stop_gradient at the stage boundary).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm
from ..registry import IMG_BACKBONES


def conv(features, kernel=3, stride=1, name=None, dtype=None):
    """3x3/1x1 conv; ``dtype`` is the COMPUTE dtype (params stay fp32).

    Pass ``dtype=x.dtype`` to make the conv follow its input: with bf16
    activations the MXU runs its native bf16 path and every intermediate
    map costs half the HBM/VMEM traffic (mixed precision; fp32 master
    params, fp32 BN statistics — see HRNet.compute_dtype)."""
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), use_bias=False, name=name,
        dtype=dtype,
    )


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train):
        x = conv(self.features, self.kernel, self.stride, dtype=x.dtype)(x)
        x = MaskedBatchNorm()(x, train=train)
        return jax.nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x, train):
        identity = x
        y = ConvBNReLU(self.planes)(x, train)
        y = ConvBNReLU(self.planes, relu=False)(y, train)
        if identity.shape[-1] != self.planes:
            identity = ConvBNReLU(self.planes, kernel=1, relu=False)(x, train)
        return jax.nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train):
        out_c = self.planes * self.expansion
        identity = x
        y = ConvBNReLU(self.planes, kernel=1)(x, train)
        y = ConvBNReLU(self.planes, stride=self.stride)(y, train)
        y = ConvBNReLU(out_c, kernel=1, relu=False)(y, train)
        if identity.shape[-1] != out_c or self.stride != 1:
            identity = ConvBNReLU(
                out_c, kernel=1, stride=self.stride, relu=False
            )(x, train)
        return jax.nn.relu(y + identity)


class HRModule(nn.Module):
    """Parallel branches + full multi-resolution fusion."""

    num_branches: int
    num_blocks: tuple
    num_channels: tuple
    multiscale_output: bool = True

    @nn.compact
    def __call__(self, xs, train):
        # per-branch blocks
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            for _ in range(self.num_blocks[i]):
                x = BasicBlock(self.num_channels[i])(x, train)
            outs.append(x)

        # fusion
        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                y = outs[j]
                if j > i:
                    # upsample: 1x1 conv + BN + bilinear resize
                    y = ConvBNReLU(self.num_channels[i], kernel=1, relu=False)(
                        y, train
                    )
                    B, H, W, C = outs[i].shape
                    y = jax.image.resize(y, (y.shape[0], H, W, C), "bilinear")
                elif j < i:
                    # downsample: (i-j) stride-2 3x3 convs
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ConvBNReLU(
                            self.num_channels[i] if last else self.num_channels[j],
                            stride=2, relu=not last,
                        )(y, train)
                acc = y if acc is None else acc + y
            fused.append(jax.nn.relu(acc))
        return fused


class _HRModuleScanBody(nn.Module):
    """nn.scan body: carry = tuple of branch maps, train broadcast."""

    num_branches: int
    num_blocks: tuple
    num_channels: tuple

    @nn.compact
    def __call__(self, xs, train):
        ys = HRModule(self.num_branches, self.num_blocks,
                      self.num_channels)(list(xs), train)
        return tuple(ys), None


class HRModuleStack(nn.Module):
    """num_modules identical HRModules compiled ONCE via nn.scan.

    mmcv repeats the module per stage (stage3 x4, stage4 x3 for w18/48);
    the repeats dominated HRNet's share of cold-compile time. Weights
    stack on a leading num_modules axis under 'scan/HRModule_0' — the
    torch checkpoint importer restacks the module-major mmcv state_dict
    accordingly (tools/convert_hrnet_checkpoint.py)."""

    num_modules: int
    num_branches: int
    num_blocks: tuple
    num_channels: tuple
    remat: bool = False  # mmcv HRNet's with_cp (torch checkpointing)

    @nn.compact
    def __call__(self, xs, train):
        body = (nn.remat(_HRModuleScanBody, static_argnums=(2,))
                if self.remat else _HRModuleScanBody)
        Body = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.num_modules,
        )
        ys, _ = Body(self.num_branches, self.num_blocks, self.num_channels,
                     name="scan")(tuple(xs), train)
        return list(ys)


@IMG_BACKBONES.register_module
class HRNet(nn.Module):
    extra: Any = None
    norm_cfg: Any = None
    norm_eval: bool = False
    frozen_stages: int = -1
    pretrained: str = None
    in_channels: int = 3
    with_cp: bool = False  # recompute stage activations in backward
    # (mmcv HRNet's with_cp, mmcv/cnn hrnet.py torch.utils.checkpoint)
    compute_dtype: Any = None  # e.g. "bfloat16": mixed-precision activations
    # (fp32 master params + BN stats; convs run the MXU's native bf16 path)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [N, H, W, 3] -> list of 4 feature maps (1/4 .. 1/32)."""
        extra = self.extra
        if self.compute_dtype is not None:
            x = x.astype(jnp.dtype(self.compute_dtype))
        # norm_eval=True (mmcv BaseModule.train() override): BN layers stay
        # in eval mode (frozen running stats) during training while convs
        # still receive gradients. The `train` flag below only gates BN —
        # gradient freezing is handled separately by stop_gradient.
        train = train and not self.norm_eval
        t1 = train and self.frozen_stages < 1

        # stem
        x = ConvBNReLU(64, stride=2)(x, t1)
        x = ConvBNReLU(64, stride=2)(x, t1)

        # stage 1: Bottleneck x num_blocks
        s1 = extra["stage1"]
        for _ in range(s1["num_blocks"][0]):
            x = Bottleneck(s1["num_channels"][0])(x, t1)
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)
        xs = [x]

        prev_channels = [s1["num_channels"][0] * 4]
        for si, key in enumerate(["stage2", "stage3", "stage4"], start=2):
            cfg = extra[key]
            ts = train and self.frozen_stages < si
            nb = cfg["num_branches"]
            chans = tuple(cfg["num_channels"])
            # transition: adapt channels / create new branch
            new_xs = []
            for i in range(nb):
                if i < len(xs):
                    if xs[i].shape[-1] != chans[i]:
                        new_xs.append(ConvBNReLU(chans[i])(xs[i], ts))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(ConvBNReLU(chans[i], stride=2)(xs[-1], ts))
            xs = new_xs
            xs = HRModuleStack(
                cfg["num_modules"], nb, tuple(cfg["num_blocks"]), chans,
                remat=self.with_cp,
            )(xs, ts)
            if self.frozen_stages >= si:
                xs = [jax.lax.stop_gradient(v) for v in xs]
            prev_channels = chans
        return xs
