"""SegNet: LiDAR-only segmentor = reader -> sparse UNet -> point head.

Re-implements /root/reference/det3d/models/detectors/seg_net.py:12-107 on
padded [B, ...] batches. forward(train=True) returns the loss dict; eval
returns per-point predictions.
"""

import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from .. import builder
from ..registry import DETECTORS


@DETECTORS.register_module
class SegNet(nn.Module):
    reader: dict = None
    backbone: dict = None
    point_head: dict = None
    neck: dict = None
    pretrained: str = None
    train_cfg: dict = None
    test_cfg: dict = None

    @nn.nowrap
    def _make_head(self):
        ph = dict(self.point_head)
        # the head needs grid geometry for devoxelization
        ph.setdefault("voxel_size", tuple(self.backbone.get("voxel_size")))
        ph.setdefault(
            "point_cloud_range", tuple(self.backbone.get("point_cloud_range"))
        )
        return builder.build_point_head(ph)

    def setup(self):
        self.reader_mod = builder.build_reader(self.reader)
        self.backbone_mod = builder.build_backbone(dict(self.backbone))
        self.point_head_mod = self._make_head()

    def __call__(self, example, train: bool = True):
        """example keys: voxels [B,V,P,D], num_points [B,V], coordinates
        [B,V,3] zyx, num_voxels [B], points [B,N,D], point_valid [B,N],
        input_shape static (Z, Y, X) incl. the +[1,0,0] z headroom."""
        voxel_features = self.reader_mod(
            example["voxels"], example["num_points"], example["coordinates"],
            train=train,
        )
        struct = sp.build_structure(
            example["coordinates"], example["num_voxels"], example["input_shape"]
        )
        st = sp.SparseTensor(structure=struct, features=voxel_features)
        bb_out = self.backbone_mod(st, train=train)

        batch = dict(example)
        batch.update(bb_out)
        ret = self.point_head_mod(batch, train=train)
        return ret, batch

    @nn.nowrap
    def loss(self, ret, batch):
        # pure (param-free) computation: usable outside apply()
        point_loss, loss_dict = self._make_head().get_loss(ret, batch)
        loss_dict["loss"] = point_loss
        return point_loss, loss_dict

    @nn.nowrap
    def predict(self, ret, batch, test_cfg=None):
        return self._make_head().predict(ret, batch, test_cfg or self.test_cfg)
