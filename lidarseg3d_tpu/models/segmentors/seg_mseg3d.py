"""SegMSeg3DNet: LiDAR + multi-camera segmentor (MSeg3D).

Re-implements /root/reference/det3d/models/detectors/seg_mseg3d_net.py:8-148:
camera branch (HRNet -> FCN head with semantic embeddings), lidar branch
(VFE -> sparse UNet), multimodal point head; total loss = point losses +
image losses.
"""

import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from .. import builder
from ..registry import DETECTORS


@DETECTORS.register_module
class SegMSeg3DNet(nn.Module):
    reader: dict = None
    backbone: dict = None
    point_head: dict = None
    img_backbone: dict = None
    img_head: dict = None
    neck: dict = None
    pretrained: str = None
    train_cfg: dict = None
    test_cfg: dict = None

    def setup(self):
        self.reader_mod = builder.build_reader(dict(self.reader))
        self.backbone_mod = builder.build_backbone(dict(self.backbone))
        self.point_head_mod = self._make_point_head()
        self.img_backbone_mod = builder.build_img_backbone(dict(self.img_backbone))
        self.img_head_mod = self._make_img_head()

    @nn.nowrap
    def _make_point_head(self):
        ph = dict(self.point_head)
        ph.setdefault("voxel_size", tuple(self.backbone.get("voxel_size")))
        ph.setdefault(
            "point_cloud_range", tuple(self.backbone.get("point_cloud_range"))
        )
        return builder.build_point_head(ph)

    @nn.nowrap
    def _make_img_head(self):
        return builder.build_img_head(dict(self.img_head))

    def __call__(self, example, train: bool = True):
        """example adds to the SegNet keys:
        images [B, ncam, H, W, 3], points_cuv [B, N, 4],
        (train) images_sem_labels [B*ncam, H, W]."""
        B = example["coordinates"].shape[0]

        # ---- camera branch ----
        images = example["images"]
        ncam = images.shape[1]
        imgs = images.reshape(B * ncam, *images.shape[2:])
        img_feats = self.img_backbone_mod(imgs, train=train)
        img_out = self.img_head_mod(img_feats, batch_size=B, train=train)

        # ---- lidar branch ----
        voxel_features = self.reader_mod(
            example["voxels"], example["num_points"], example["coordinates"],
            train=train,
        )
        struct = sp.build_structure(
            example["coordinates"], example["num_voxels"], example["input_shape"]
        )
        st = sp.SparseTensor(structure=struct, features=voxel_features)
        bb_out = self.backbone_mod(st, train=train)

        # ---- fusion head ----
        batch = dict(example)
        batch.update(bb_out)
        batch.update(img_out)
        ret = self.point_head_mod(batch, train=train)
        ret["image_logits"] = img_out["image_logits"]
        return ret, batch

    @nn.nowrap
    def loss(self, ret, batch):
        point_loss, ldict = self._make_point_head().get_loss(ret, batch)
        img_loss, img_ldict = self._make_img_head().get_loss(ret, batch)
        ldict.update(img_ldict)
        total = point_loss + img_loss
        ldict["loss"] = total
        return total, ldict

    @nn.nowrap
    def predict(self, ret, batch, test_cfg=None):
        return self._make_point_head().predict(
            ret, batch, test_cfg or self.test_cfg
        )
