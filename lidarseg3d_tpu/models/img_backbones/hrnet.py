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

Space-to-depth branch blocks (s2d_max_c): the narrow branches (C=18 for
w18) run their 3x3 convs at ~2% MXU utilization — an [M,18]x[18,18] tap
GEMM uses 18 of 128 lanes on BOTH the contraction and output dims of the
128x128 systolic array. Branches with C <= s2d_max_c therefore live in
space-to-depth(2) layout: [N,H,W,C] -> [N,H/2,W/2,4C], where the same 3x3
stride-1 conv is EXACTLY a 3x3 conv with a rearranged (block-structured)
[3,3,4C,4C] kernel — 4x the MACs at (72/128)^2 vs (18/128)^2 utilization,
i.e. ~4x net on the MXU (measured on v5e: tools/bench/mb_conv_variants.py).
The layout is PERSISTENT across a whole HRModuleStack: branches convert
once at stack entry/exit, and the multi-resolution fusion reads/writes s2d
branches natively (upsample_into_s2d phase stacks; stride-2 downsample
convs consume s2d input via a [2,2,4C,Cout] rearranged kernel,
s2d_down_kernel3). Parameters are IDENTICAL to the plain layout (kernels
are rearranged at apply time), so checkpoint import and the golden parity
tests are unchanged.
"""

import itertools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm
from ..registry import IMG_BACKBONES
from ...ops.resize import resize_bilinear, upsample_into_s2d


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


def space_to_depth(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C]; channel = (sy*2 + sx)*C + c."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)


def depth_to_space(x):
    """Inverse of space_to_depth."""
    N, H2, W2, C4 = x.shape
    C = C4 // 4
    x = x.reshape(N, H2, W2, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(N, H2 * 2, W2 * 2, C)


def s2d_kernel3(w):
    """Rearrange a [3,3,Cin,Cout] stride-1 same-pad conv kernel into the
    [3,3,4Cin,4Cout] kernel that computes the SAME conv on space-to-depth(2)
    inputs/outputs. Output sub-pixel (dy,dx) at s2d site (Y,X) is original
    pixel (2Y+dy, 2X+dx); its tap (ky,kx) reads original row 2Y+dy+ky-1 =
    s2d row Y + (dy+ky-1)//2, sub-row (dy+ky-1) mod 2. The s2d conv's
    1-site padding covers the original 1-pixel padding exactly (the extra
    padded sub-rows get zero weights)."""
    Cin, Cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((3, 3, 4 * Cin, 4 * Cout), w.dtype)
    for dy, dx, ky, kx in itertools.product(
            range(2), range(2), range(3), range(3)):
        ry, sy = (dy + ky - 1) // 2 + 1, (dy + ky - 1) % 2
        rx, sx = (dx + kx - 1) // 2 + 1, (dx + kx - 1) % 2
        si, di = (sy * 2 + sx) * Cin, (dy * 2 + dx) * Cout
        w2 = w2.at[ry, rx, si:si + Cin, di:di + Cout].set(w[ky, kx])
    return w2


def s2d_down_kernel3(w):
    """Rearrange a [3,3,Cin,Cout] STRIDE-2 same-pad conv kernel into the
    [2,2,4Cin,Cout] stride-1 kernel that computes the same conv directly
    from space-to-depth(2) input (normal-layout half-resolution output).
    Output (y',x') reads original rows 2y'+ky-1 = s2d row y'-1+ry, sub-row
    sy with ky = 2*ry + sy - 1; pad one s2d row/col at the leading edge
    (its sub-row 0 = original row -2 gets zero weight, sub-row 1 = the
    original conv's -1 padding)."""
    Cin, Cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * Cin, Cout), w.dtype)
    for ry, sy, rx, sx in itertools.product(
            range(2), range(2), range(2), range(2)):
        ky, kx = 2 * ry + sy - 1, 2 * rx + sx - 1
        if not (0 <= ky <= 2 and 0 <= kx <= 2):
            continue
        si = (sy * 2 + sx) * Cin
        w2 = w2.at[ry, rx, si:si + Cin, :].set(w[ky, kx])
    return w2


class S2DDownConv(nn.Module):
    """3x3 stride-2 conv consuming space-to-depth(2) input, producing
    normal-layout half-resolution output; params are the plain
    [3,3,Cin,Cout] kernel (rearranged at apply time)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features))
        dt = self.dtype or x.dtype
        k2 = s2d_down_kernel3(kernel).astype(dt)
        return jax.lax.conv_general_dilated(
            x.astype(dt), k2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class S2DConv(nn.Module):
    """3x3 stride-1 conv on space-to-depth(2) inputs; params are the plain
    [3,3,Cin,Cout] kernel (rearranged at apply time), so the tree matches
    the plain conv 1:1. ``features`` is the ORIGINAL channel count."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features))
        dt = self.dtype or x.dtype
        k2 = s2d_kernel3(kernel).astype(dt)
        return jax.lax.conv_general_dilated(
            x.astype(dt), k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    s2d: bool = False  # operate in space-to-depth(2) layout (see header)
    s2d_in: bool = False  # stride-2 conv CONSUMING s2d input (normal out)

    @nn.compact
    def __call__(self, x, train):
        if self.s2d:
            assert self.kernel == 3 and self.stride == 1
            x = S2DConv(self.features, dtype=x.dtype, name="Conv_0")(x)
            x = MaskedBatchNorm(sub_groups=4)(x, train=train)
        elif self.s2d_in:
            assert self.kernel == 3 and self.stride == 2
            x = S2DDownConv(self.features, dtype=x.dtype, name="Conv_0")(x)
            x = MaskedBatchNorm()(x, train=train)
        else:
            x = conv(self.features, self.kernel, self.stride,
                     dtype=x.dtype)(x)
            x = MaskedBatchNorm()(x, train=train)
        return jax.nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    planes: int
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train):
        identity = x
        y = ConvBNReLU(self.planes, s2d=self.s2d)(x, train)
        y = ConvBNReLU(self.planes, relu=False, s2d=self.s2d)(y, train)
        in_c = identity.shape[-1] // 4 if self.s2d else identity.shape[-1]
        if in_c != self.planes:
            assert not self.s2d  # branch blocks never change channels
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
    """Parallel branches + full multi-resolution fusion.

    Branches flagged in ``s2d_branches`` arrive, compute, and leave in
    PERSISTENT space-to-depth(2) layout ([N,H/2,W/2,4C]): their blocks run
    S2DConv, and the fusion reads/writes them without ever materializing
    the [N,H,W,C] form (C<=18 maps waste 110/128 VPU lanes and MXU
    contraction dims; the per-module s2d<->d2s roundtrip of the previous
    design gave back the whole branch-level win — measured on v5e,
    tools/bench/mb_hrnet_stages.py: stage3 17.2 ms both ways). Conversion
    now happens once per HRModuleStack, not once per module x branch."""

    num_branches: int
    num_blocks: tuple
    num_channels: tuple
    multiscale_output: bool = True
    s2d_branches: tuple = ()

    @nn.compact
    def __call__(self, xs, train):
        flags = (tuple(self.s2d_branches)
                 or (False,) * self.num_branches)
        # per-branch blocks (s2d branches stay in s2d layout throughout)
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            for _ in range(self.num_blocks[i]):
                x = BasicBlock(self.num_channels[i], s2d=flags[i])(x, train)
            outs.append(x)

        def full_hw(i):
            h, w = outs[i].shape[1], outs[i].shape[2]
            return (h * 2, w * 2) if flags[i] else (h, w)

        # fusion
        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                y = outs[j]
                if j > i:
                    # upsample: 1x1 conv + BN at branch-j res + bilinear
                    if flags[j]:
                        y = depth_to_space(y)
                    y = ConvBNReLU(self.num_channels[i], kernel=1, relu=False)(
                        y, train
                    )
                    H, W = full_hw(i)
                    if flags[i]:
                        y = upsample_into_s2d(y, H // y.shape[1])
                    else:
                        y = resize_bilinear(y, (H, W))
                elif j < i:
                    # downsample: (i-j) stride-2 3x3 convs; the first conv
                    # consumes s2d input directly via the rearranged kernel
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ConvBNReLU(
                            self.num_channels[i] if last else self.num_channels[j],
                            stride=2, relu=not last,
                            s2d_in=flags[j] and k == 0,
                        )(y, train)
                    if flags[i]:
                        y = space_to_depth(y)
                acc = y if acc is None else acc + y
            fused.append(jax.nn.relu(acc))
        return fused


class _HRModuleScanBody(nn.Module):
    """nn.scan body: carry = tuple of branch maps, train broadcast."""

    num_branches: int
    num_blocks: tuple
    num_channels: tuple
    s2d_branches: tuple = ()

    @nn.compact
    def __call__(self, xs, train):
        ys = HRModule(self.num_branches, self.num_blocks,
                      self.num_channels,
                      s2d_branches=self.s2d_branches)(list(xs), train)
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
    s2d_max_c: int = 0

    @nn.compact
    def __call__(self, xs, train):
        # persistent s2d layout: convert flagged branches ONCE at stack
        # entry/exit; every module in the scan keeps them in s2d form
        flags = tuple(
            0 < self.num_channels[i] <= self.s2d_max_c
            and xs[i].shape[1] % 2 == 0 and xs[i].shape[2] % 2 == 0
            and xs[i].shape[-1] == self.num_channels[i]
            for i in range(self.num_branches))
        xs = [space_to_depth(x) if f else x for f, x in zip(flags, xs)]
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
                     s2d_branches=flags, name="scan")(tuple(xs), train)
        return [depth_to_space(y) if f else y for f, y in zip(flags, ys)]


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
    s2d_max_c: int = 18  # branches at <= this channel count run their
    # blocks in space-to-depth(2) layout (exact rewrite; see module header).
    # 0 disables.

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
                remat=self.with_cp, s2d_max_c=self.s2d_max_c,
            )(xs, ts)
            if self.frozen_stages >= si:
                xs = [jax.lax.stop_gradient(v) for v in xs]
            prev_channels = chans
        return xs
