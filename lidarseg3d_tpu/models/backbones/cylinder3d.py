"""Cylinder3D asymmetric sparse UNet backbone.

Re-implements /root/reference/det3d/models/backbones/cylinder3d_backbone.py:
ResContext + 4 asymmetric ResBlocks (strided pooling; height kept at the two
deepest levels), UpBlocks with inverse convs, sigmoid-gated ReconBlock, and
a final subm classifier densified to [B, R, P, Z, ncls] for the PolarNet-
style point head. Axis order here is (r, phi, z): "height_pooling=False"
keeps the z axis (stride (2, 2, 1)).

The _v2p variant returns the stride-1 sparse features instead of dense
logits (cylinder3d_backbone.py:341+), for use with a point head.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import sparse as sp
from ..layers import MaskedBatchNorm
from ..registry import BACKBONES
from ..sparse_modules import SubMConv3d, SparseConv3d, SparseInverseConv3d


class _RBCache:
    """Per-forward rulebook cache keyed by (structure id, kernel shape)."""

    def __init__(self):
        self.tables = {}
        self.rbs = {}

    def table(self, struct):
        key = id(struct)
        if key not in self.tables:
            self.tables[key] = sp.dense_table(struct)
        return self.tables[key]

    def subm(self, struct, ks):
        key = (id(struct), tuple(sp._triple(ks)))
        if key not in self.rbs:
            self.rbs[key] = sp.build_subm_rulebook(
                struct, ks, table=self.table(struct)
            )
        return self.rbs[key]

    def strided_pair(self, s_in, s_out, ks, stride, pad):
        """(strided rulebook, its transpose = the inverse rulebook) — shared
        between the encoder's pooling conv and the decoder's inverse conv
        (spconv indice_key semantics + the fused kernel's backward)."""
        key = ("sp", id(s_in), id(s_out), tuple(sp._triple(ks)),
               tuple(sp._triple(stride)), tuple(sp._triple(pad)))
        if key not in self.rbs:
            rb = sp.build_strided_rulebook(
                s_in, s_out, ks, stride, pad, table=self.table(s_in)
            )
            rb_inv = sp.build_inverse_rulebook(
                s_out, s_in, ks, stride, pad, table=self.table(s_out)
            )
            self.rbs[key] = (rb, rb_inv)
        return self.rbs[key]


class AsymmConvBNAct(nn.Module):
    features: int
    kernel_size: tuple = (3, 3, 3)
    act: str = "leaky"  # leaky | sigmoid | none
    act_first: bool = True  # reference applies act THEN bn in most blocks

    @nn.compact
    def __call__(self, st, rulebook, train):
        out = SubMConv3d(self.features, self.kernel_size)(st, rulebook)
        f = out.features
        mask = out.valid_mask()

        def act(x):
            if self.act == "leaky":
                return nn.leaky_relu(x, 0.01)
            if self.act == "sigmoid":
                return jax.nn.sigmoid(x)
            return x

        if self.act_first:
            f = act(f)
            f = MaskedBatchNorm()(f, mask=mask, train=train)
        else:
            f = MaskedBatchNorm()(f, mask=mask, train=train)
            f = act(f)
        return sp.SparseTensor(structure=out.structure, features=f)


class ResContextBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, st, cache, train):
        k13 = (1, 3, 3)
        k31 = (3, 1, 3)
        s = st.structure
        sc = AsymmConvBNAct(self.features, k13)(st, cache.subm(s, k13), train)
        sc = AsymmConvBNAct(self.features, k31)(sc, cache.subm(s, k31), train)
        r = AsymmConvBNAct(self.features, k31)(st, cache.subm(s, k31), train)
        r = AsymmConvBNAct(self.features, k13)(r, cache.subm(s, k13), train)
        return sp.SparseTensor(structure=s, features=r.features + sc.features)


class AsymmResBlock(nn.Module):
    features: int
    pooling: bool = True
    height_pooling: bool = False
    down_capacity: int = 0

    @nn.compact
    def __call__(self, st, cache, train):
        k13 = (1, 3, 3)
        k31 = (3, 1, 3)
        s = st.structure
        sc = AsymmConvBNAct(self.features, k31)(st, cache.subm(s, k31), train)
        sc = AsymmConvBNAct(self.features, k13)(sc, cache.subm(s, k13), train)
        r = AsymmConvBNAct(self.features, k13)(st, cache.subm(s, k13), train)
        r = AsymmConvBNAct(self.features, k31)(r, cache.subm(s, k31), train)
        resA = sp.SparseTensor(structure=s, features=r.features + sc.features)
        if not self.pooling:
            return resA, resA, None
        stride = (2, 2, 2) if self.height_pooling else (2, 2, 1)
        down_struct = sp.downsample_structure(s, stride, self.down_capacity)
        rb, rb_inv = cache.strided_pair(s, down_struct, 3, stride, 1)
        pooled = SparseConv3d(self.features, 3, stride, 1)(
            resA, down_struct, rb, rb_inv)
        return pooled, resA, stride


class AsymmUpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, st, skip, stride, cache, train):
        s_low = st.structure
        s_hi = skip.structure
        k33 = (3, 3, 3)
        k13 = (1, 3, 3)
        k31 = (3, 1, 3)
        up = AsymmConvBNAct(self.features, k33)(st, cache.subm(s_low, k33), train)
        rb_strided, rb_inv = cache.strided_pair(s_hi, s_low, 3, stride, 1)
        up = SparseInverseConv3d(self.features, 3, stride, 1)(
            up, s_hi, rb_inv, rb_strided)
        up = sp.SparseTensor(
            structure=s_hi, features=up.features + skip.features
        )
        up = AsymmConvBNAct(self.features, k13)(up, cache.subm(s_hi, k13), train)
        up = AsymmConvBNAct(self.features, k31)(up, cache.subm(s_hi, k31), train)
        up = AsymmConvBNAct(self.features, k33)(up, cache.subm(s_hi, k33), train)
        return up


class ReconBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, st, cache, train):
        s = st.structure
        outs = []
        for ks in ((3, 1, 1), (1, 3, 1), (1, 1, 3)):
            o = AsymmConvBNAct(self.features, ks, act="sigmoid",
                               act_first=False)(st, cache.subm(s, ks), train)
            outs.append(o.features)
        gate = outs[0] + outs[1] + outs[2]
        return sp.SparseTensor(structure=s, features=gate * st.features)


@BACKBONES.register_module
class Cylinder3D_Asymm_3d_spconv(nn.Module):
    output_shape: tuple = (480, 360, 32)  # (R, P, Z)
    num_input_features: int = 16
    nclasses: int = 17
    n_height: int = 32
    init_size: int = 16
    use_norm: bool = True
    strict: bool = False
    down_capacity_ratios: tuple = (0.6, 0.4, 0.25, 0.2)
    return_sparse: bool = False  # the _v2p variant

    @nn.compact
    def __call__(self, st_in: sp.SparseTensor, train: bool = True):
        cache = _RBCache()
        V = st_in.structure.capacity
        caps = [max(1, int(V * r)) for r in self.down_capacity_ratios]
        c = self.init_size

        x = ResContextBlock(c)(st_in, cache, train)
        down1c, down1b, s1 = AsymmResBlock(2 * c, True, True, caps[0])(
            x, cache, train)
        down2c, down2b, s2 = AsymmResBlock(4 * c, True, True, caps[1])(
            down1c, cache, train)
        down3c, down3b, s3 = AsymmResBlock(8 * c, True, False, caps[2])(
            down2c, cache, train)
        down4c, down4b, s4 = AsymmResBlock(16 * c, True, False, caps[3])(
            down3c, cache, train)

        up4e = AsymmUpBlock(16 * c)(down4c, down4b, s4, cache, train)
        up3e = AsymmUpBlock(8 * c)(up4e, down3b, s3, cache, train)
        up2e = AsymmUpBlock(4 * c)(up3e, down2b, s2, cache, train)
        up1e = AsymmUpBlock(2 * c)(up2e, down1b, s1, cache, train)

        up0e = ReconBlock(2 * c)(up1e, cache, train)
        feats = jnp.concatenate([up0e.features, up1e.features], axis=-1)
        st_out = sp.SparseTensor(structure=up1e.structure, features=feats)
        if self.return_sparse:
            return {"sparse_features": st_out}

        logits_st = SubMConv3d(self.nclasses, 3)(
            st_out, cache.subm(st_out.structure, 3)
        )
        # densify to [B, R, P, Z, ncls] for the PolarNet-style head
        R, P, Z = (int(v) for v in self.output_shape)
        B, Vc, C = logits_st.features.shape
        coords = logits_st.structure.coords
        valid = logits_st.structure.valid_mask()
        cell = coords[..., 0] * (P * Z) + coords[..., 1] * Z + coords[..., 2]
        offs = (jnp.arange(B, dtype=jnp.int32) * (R * P * Z))[:, None]
        tgt = jnp.where(valid, cell + offs, B * R * P * Z).reshape(-1)
        dense = jnp.zeros((B * R * P * Z + 1, C), logits_st.features.dtype)
        dense = dense.at[tgt].set(logits_st.features.reshape(-1, C))
        return {"bev_logits": dense[:-1].reshape(B, R, P, Z, C)}


@BACKBONES.register_module
class Cylinder3D_Asymm_3d_spconv_v2p(Cylinder3D_Asymm_3d_spconv):
    """Variant returning per-voxel sparse features (for point heads)."""

    return_sparse: bool = True
