"""Sparse-conv UNet backbone (UNetSCN3D).

Re-implements the reference seg backbone
(/root/reference/det3d/models/backbones/scn_unet.py:73-249) on the
rulebook/gather sparse-conv stack: residual encoder (4 stride-2 stages),
UR-block decoder with inverse convs back onto the stored structures, BN
eps=1e-3 momentum=0.01 throughout. All structures and rulebooks are built
once per forward and shared (indice_key semantics).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ..registry import BACKBONES
from ..sparse_modules import (
    SparseBasicBlock,
    SparseBasicBlockStack,
    SparseConvBNReLU,
)


@BACKBONES.register_module
class UNetSCN3D(nn.Module):
    num_input_features: int = 16
    ds_factor: int = 8
    us_factor: int = 8
    point_cloud_range: tuple = ()
    voxel_size: tuple = ()
    model_cfg: dict = None

    def _cfg(self, key, default):
        return (self.model_cfg or {}).get(key, default)

    @nn.compact
    def __call__(self, st_in: sp.SparseTensor, train: bool = True):
        r = self._cfg("SCALING_RATIO", 1)
        caps = self._cfg("DOWN_CAPACITY_RATIOS", (0.5, 0.25, 0.15))
        # OUTPUT_SITES="union" restores spconv's receptive-field-union
        # strided output sites for reference parity (default: decimation;
        # see ops.sparse.downsample_structure)
        sites = self._cfg("OUTPUT_SITES", "decimation")
        subm_rb = sp.build_subm_rulebook
        V = st_in.structure.capacity

        # ---- structures + rulebooks (one dense table per stage) ----
        s1 = st_in.structure
        t1 = sp.dense_table(s1)
        rb_subm1 = subm_rb(s1, table=t1)

        s2 = sp.downsample_structure(s1, 2, capacity=max(1, int(V * caps[0])),
                                     padding=1, rule=sites)
        rb_down2 = sp.build_strided_rulebook(s1, s2, 3, 2, 1, table=t1)
        t2 = sp.dense_table(s2)
        rb_subm2 = subm_rb(s2, table=t2)
        rb_inv2 = sp.build_inverse_rulebook(s2, s1, 3, 2, 1, table=t2)

        s3 = sp.downsample_structure(s2, 2, capacity=max(1, int(V * caps[1])),
                                     padding=1, rule=sites)
        t3 = sp.dense_table(s3)
        rb_down3 = sp.build_strided_rulebook(s2, s3, 3, 2, 1, table=t2)
        rb_subm3 = subm_rb(s3, table=t3)
        rb_inv3 = sp.build_inverse_rulebook(s3, s2, 3, 2, 1, table=t3)

        s4 = sp.downsample_structure(s3, 2, capacity=max(1, int(V * caps[2])),
                                     padding=(0, 1, 1), rule=sites)
        t4 = sp.dense_table(s4)
        rb_down4 = sp.build_strided_rulebook(s3, s4, 3, 2, (0, 1, 1), table=t3)
        rb_subm4 = subm_rb(s4, table=t4)
        rb_inv4 = sp.build_inverse_rulebook(s4, s3, 3, 2, (0, 1, 1), table=t4)

        blk = lambda c, **kw: SparseConvBNReLU(c, **kw)
        # ACT_REMAT recomputes residual-block activations in the backward
        # pass (torch.utils.checkpoint parity; unlocks B>=4 full-scan
        # training on 16 GB HBM)
        rm = bool(self._cfg("ACT_REMAT", False))

        # ---- encoder (block pairs scanned: compiled once per stage) ----
        x = blk(16 * r, conv_type="subm")(st_in, rb_subm1, train=train)  # conv_input
        x_conv1 = SparseBasicBlockStack(16 * r, n=2, remat=rm)(
            x, rb_subm1, train=train)

        x = blk(32 * r, conv_type="spconv", padding=1)(
            x_conv1, rb_down2, out_struct=s2, rulebook_t=rb_inv2, train=train
        )
        x_conv2 = SparseBasicBlockStack(32 * r, n=2, remat=rm)(
            x, rb_subm2, train=train)

        x = blk(64 * r, conv_type="spconv", padding=1)(
            x_conv2, rb_down3, out_struct=s3, rulebook_t=rb_inv3, train=train
        )
        x_conv3 = SparseBasicBlockStack(64 * r, n=2, remat=rm)(
            x, rb_subm3, train=train)

        x = blk(64 * r, conv_type="spconv", padding=(0, 1, 1))(
            x_conv3, rb_down4, out_struct=s4, rulebook_t=rb_inv4, train=train
        )
        x_conv4 = SparseBasicBlockStack(64 * r, n=2, remat=rm)(
            x, rb_subm4, train=train)

        out = {}
        if self._cfg("RETURN_ENCODED_TENSOR", False):
            # detection-only encoded BEV tensor (scn_unet.py:125-136)
            s_out = sp.downsample_structure(s4, (2, 1, 1), capacity=s4.capacity)
            last_pad = self._cfg("last_pad", 0)
            rb_out = sp.build_strided_rulebook(
                s4, s_out, (3, 1, 1), (2, 1, 1), last_pad, table=t4
            )
            rb_out_t = sp.build_inverse_rulebook(
                s_out, s4, (3, 1, 1), (2, 1, 1), last_pad
            )
            enc = blk(128, conv_type="spconv", kernel_size=(3, 1, 1),
                      stride=(2, 1, 1), padding=last_pad)(
                x_conv4, rb_out, out_struct=s_out, rulebook_t=rb_out_t,
                train=train)
            out["encoded_spconv_tensor"] = enc
            out["encoded_spconv_tensor_stride"] = 8

        # ---- decoder (UR blocks, scn_unet.py:163-171) ----
        def ur_block(x_lateral, x_bottom, rb_lat, c_mid, inv, inv_args):
            x_trans = SparseBasicBlock(x_lateral.features.shape[-1])(
                x_lateral, rb_lat, train=train
            )
            cat = jnp.concatenate([x_bottom.features, x_trans.features], axis=-1)
            x_cat = sp.SparseTensor(structure=x_lateral.structure, features=cat)
            x_m = blk(c_mid, conv_type="subm")(x_cat, rb_lat, train=train)
            n, cin = cat.shape[-2], cat.shape[-1]
            red = cat.reshape(cat.shape[0], n, c_mid, -1).sum(axis=-1)
            fused = sp.SparseTensor(
                structure=x_lateral.structure, features=x_m.features + red
            )
            return inv(fused, *inv_args)

        x_up4 = ur_block(
            x_conv4, x_conv4, rb_subm4, 64 * r,
            lambda st, tgt, rb: blk(64 * r, conv_type="inverseconv",
                                    padding=(0, 1, 1))(st, rb, out_struct=tgt,
                                                       rulebook_t=rb_down4,
                                                       train=train),
            (s3, rb_inv4),
        )
        x_up3 = ur_block(
            x_conv3, x_up4, rb_subm3, 64 * r,
            lambda st, tgt, rb: blk(32 * r, conv_type="inverseconv")(
                st, rb, out_struct=tgt, rulebook_t=rb_down3, train=train),
            (s2, rb_inv3),
        )
        x_up2 = ur_block(
            x_conv2, x_up3, rb_subm2, 32 * r,
            lambda st, tgt, rb: blk(16 * r, conv_type="inverseconv")(
                st, rb, out_struct=tgt, rulebook_t=rb_down2, train=train),
            (s1, rb_inv2),
        )
        # final stage: "inverse" is a plain subm block (conv5, scn_unet.py:158-160)
        x_up1 = ur_block(
            x_conv1, x_up2, rb_subm1, 16 * r,
            lambda st, tgt, rb: blk(16 * r, conv_type="subm")(st, rb, train=train),
            (None, rb_subm1),
        )

        centers = sp.voxel_centers(s1, self.voxel_size, self.point_cloud_range)
        out.update(
            conv_point_features=x_up1.features,  # [B, V, 16r]
            conv_point_coords=centers,  # [B, V, 3] metric xyz
            conv_structure=s1,
            conv_table=t1,
            # stride-1 subm rulebook, reused by the point heads'
            # devoxelization (ops/interpolate.py _grid_interp_rulebook)
            conv_subm_rulebook=rb_subm1,
            multi_scale_3d_features={
                "x_conv1": x_up2, "x_conv2": x_up3, "x_conv3": x_up4,
                "x_conv4": x_conv4,
            },
        )
        return out


@BACKBONES.register_module
class UNetCylinder3D(UNetSCN3D):
    """Cylindrical-grid variant (cf. det3d/models/backbones/
    scn_unet_cylinder3d.py:257). The rulebook machinery is grid-agnostic, so
    the architecture is identical — only the coordinate system of the input
    structure differs (built by Cylinder3DDynamicVoxelFeatureExtractor)."""
