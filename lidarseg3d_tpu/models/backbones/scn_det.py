"""Detection middle encoder (SpMiddleResNetFHD).

Re-implements /root/reference/det3d/models/backbones/scn.py:84-170 on the
rulebook sparse-conv stack: subm input conv, 2 residual blocks, 3 stride-2
downsample stages (16/32/64/128), extra (3,1,1)-stride-(2,1,1) conv, then
densification to a BEV map [B, H/8, W/8, C*D'] (NHWC).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ..registry import BACKBONES
from ..sparse_modules import SparseBasicBlock, SparseConvBNReLU


@BACKBONES.register_module
class SpMiddleResNetFHD(nn.Module):
    num_input_features: int = 5
    norm_cfg: dict = None
    ds_factor: int = 8
    down_capacity_ratios: tuple = (0.5, 0.25, 0.15, 0.15)

    @nn.compact
    def __call__(self, st_in: sp.SparseTensor, train: bool = True):
        caps = self.down_capacity_ratios
        V = st_in.structure.capacity
        blk = SparseConvBNReLU

        s1 = st_in.structure
        t1 = sp.dense_table(s1)
        rb1 = sp.build_subm_rulebook(s1, table=t1)
        x = blk(16, conv_type="subm")(st_in, rb1, train=train)
        x = SparseBasicBlock(16)(x, rb1, train=train)
        x = SparseBasicBlock(16)(x, rb1, train=train)

        def down(x, cin_struct, table, feat, cap, pad):
            out_struct = sp.downsample_structure(cin_struct, 2, cap)
            rb_d = sp.build_strided_rulebook(cin_struct, out_struct, 3, 2,
                                             pad, table=table)
            t = sp.dense_table(out_struct)
            rb_d_t = sp.build_inverse_rulebook(out_struct, cin_struct, 3, 2,
                                               pad, table=t)
            y = blk(feat, conv_type="spconv", padding=pad)(
                x, rb_d, out_struct=out_struct, rulebook_t=rb_d_t, train=train)
            rb = sp.build_subm_rulebook(out_struct, table=t)
            y = SparseBasicBlock(feat)(y, rb, train=train)
            y = SparseBasicBlock(feat)(y, rb, train=train)
            return y, out_struct, t

        x, s2, t2 = down(x, s1, t1, 32, max(1, int(V * caps[0])), 1)
        x, s3, t3 = down(x, s2, t2, 64, max(1, int(V * caps[1])), 1)
        x, s4, t4 = down(x, s3, t3, 128, max(1, int(V * caps[2])), (0, 1, 1))

        # extra conv: z-only downsample (3,1,1) stride (2,1,1)
        s5 = sp.downsample_structure(s4, (2, 1, 1), max(1, int(V * caps[3])))
        rb5 = sp.build_strided_rulebook(s4, s5, (3, 1, 1), (2, 1, 1), 0,
                                        table=t4)
        rb5_t = sp.build_inverse_rulebook(s5, s4, (3, 1, 1), (2, 1, 1), 0)
        x = blk(128, conv_type="spconv", kernel_size=(3, 1, 1),
                stride=(2, 1, 1), padding=0)(x, rb5, out_struct=s5,
                                             rulebook_t=rb5_t, train=train)

        # densify: [B, Z', Y', X', C] -> BEV [B, Y', X', Z'*C]
        Z, Y, X = s5.spatial_shape
        B, Vc, C = x.features.shape
        coords = s5.coords
        valid = s5.valid_mask()
        cell = coords[..., 0] * (Y * X) + coords[..., 1] * X + coords[..., 2]
        offs = (jnp.arange(B, dtype=jnp.int32) * (Z * Y * X))[:, None]
        tgt = jnp.where(valid, cell + offs, B * Z * Y * X).reshape(-1)
        dense = jnp.zeros((B * Z * Y * X + 1, C), x.features.dtype)
        dense = dense.at[tgt].set(x.features.reshape(-1, C))
        dense = dense[:-1].reshape(B, Z, Y, X, C)
        bev = dense.transpose(0, 2, 3, 1, 4).reshape(B, Y, X, Z * C)
        return bev
