"""Flax modules wrapping the sparse conv ops (spconv-equivalent layer zoo).

Rulebooks (gather index lists) are built once per structure by the backbone
and passed in — the indice_key sharing of the reference
(scn_unet.py:90-160) becomes explicit rulebook reuse.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse as sp
from .layers import conv_kernel_init, MaskedBatchNorm


def _num_taps(kernel_size):
    ks = sp._triple(kernel_size)
    return ks[0] * ks[1] * ks[2]


class SubMConv3d(nn.Module):
    features: int
    kernel_size: Any = 3

    @nn.compact
    def __call__(self, st: sp.SparseTensor, rulebook):
        K = _num_taps(self.kernel_size)
        Cin = st.features.shape[-1]
        w = self.param("kernel", conv_kernel_init, (K, Cin, self.features))
        out = sp.subm_conv(st, w, kernel_size=self.kernel_size, rulebook=rulebook)
        return sp.SparseTensor(structure=st.structure, features=out)


class SparseConv3d(nn.Module):
    """Strided ("spconv") conv onto a precomputed downsampled structure."""

    features: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1

    @nn.compact
    def __call__(self, st: sp.SparseTensor, out_struct, rulebook,
                 rulebook_t=None):
        K = _num_taps(self.kernel_size)
        Cin = st.features.shape[-1]
        w = self.param("kernel", conv_kernel_init, (K, Cin, self.features))
        out = sp.strided_conv(
            st, out_struct, w, self.kernel_size, self.stride, self.padding,
            rulebook=rulebook, rulebook_t=rulebook_t,
        )
        return sp.SparseTensor(structure=out_struct, features=out)


class SparseInverseConv3d(nn.Module):
    features: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1

    @nn.compact
    def __call__(self, st_low: sp.SparseTensor, target_struct, rulebook,
                 rulebook_t=None):
        K = _num_taps(self.kernel_size)
        Cin = st_low.features.shape[-1]
        w = self.param("kernel", conv_kernel_init, (K, Cin, self.features))
        out = sp.inverse_conv(
            st_low, target_struct, w, self.kernel_size, self.stride, self.padding,
            rulebook=rulebook, rulebook_t=rulebook_t,
        )
        return sp.SparseTensor(structure=target_struct, features=out)


class SparseConvBNReLU(nn.Module):
    """conv + BN + ReLU (the reference's post_act_block, scn_unet.py:11-30)."""

    features: int
    kernel_size: Any = 3
    conv_type: str = "subm"  # subm | spconv | inverseconv
    stride: Any = 2
    padding: Any = 1
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, st, rulebook, out_struct=None, rulebook_t=None,
                 train: bool = True):
        if self.conv_type == "subm":
            out = SubMConv3d(self.features, self.kernel_size)(st, rulebook)
        elif self.conv_type == "spconv":
            out = SparseConv3d(
                self.features, self.kernel_size, self.stride, self.padding
            )(st, out_struct, rulebook, rulebook_t)
        elif self.conv_type == "inverseconv":
            out = SparseInverseConv3d(
                self.features, self.kernel_size, self.stride, self.padding
            )(st, out_struct, rulebook, rulebook_t)
        else:
            raise ValueError(self.conv_type)
        bn = MaskedBatchNorm(eps=self.bn_eps, momentum=self.bn_momentum)
        f = bn(out.features, mask=out.valid_mask(), train=train)
        return sp.SparseTensor(structure=out.structure, features=jax.nn.relu(f))


class _SparseBasicBlockBody(nn.Module):
    """nn.scan body: carry = features; structure/rulebook/train broadcast."""

    features: int

    @nn.compact
    def __call__(self, feats, structure, rulebook, train):
        st = sp.SparseTensor(structure=structure, features=feats)
        out = SparseBasicBlock(self.features)(st, rulebook, train=train)
        return out.features, None


class SparseBasicBlockStack(nn.Module):
    """n consecutive SparseBasicBlocks compiled ONCE via nn.scan.

    The UNet repeats identical residual blocks per stage (scn_unet.py:
    98-123); tracing/compiling each separately dominated cold-compile time
    on TPU, so the repeats run as a weight-stacked scan (params/batch_stats
    carry a leading n axis under 'blocks/SparseBasicBlock_0')."""

    features: int
    n: int = 2
    remat: bool = False  # recompute block activations in backward
    # (torch.utils.checkpoint equivalent; enables B>=4 full-scan training
    # within v5e HBM — see STATUS "Batched training")

    @nn.compact
    def __call__(self, st: sp.SparseTensor, rulebook, train: bool = True):
        body = (nn.remat(_SparseBasicBlockBody, static_argnums=(4,))
                if self.remat else _SparseBasicBlockBody)
        Body = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            length=self.n,
        )
        feats, _ = Body(self.features, name="blocks")(
            st.features, st.structure, rulebook, train
        )
        return sp.SparseTensor(structure=st.structure, features=feats)


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (scn_unet.py:34-69)."""

    features: int
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, st: sp.SparseTensor, rulebook, train: bool = True):
        mask = st.valid_mask()
        identity = st.features
        out = SubMConv3d(self.features)(st, rulebook)
        f = MaskedBatchNorm(eps=self.bn_eps, momentum=self.bn_momentum)(
            out.features, mask=mask, train=train
        )
        f = jax.nn.relu(f)
        out = SubMConv3d(self.features)(
            sp.SparseTensor(structure=st.structure, features=f), rulebook
        )
        f = MaskedBatchNorm(eps=self.bn_eps, momentum=self.bn_momentum)(
            out.features, mask=mask, train=train
        )
        f = jax.nn.relu(f + identity)
        return sp.SparseTensor(structure=st.structure, features=f)
