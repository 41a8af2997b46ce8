"""SegPolarNet: dynamic-VFE segmentor (PolarNet / Cylinder3D family).

Re-implements det3d/models/detectors/seg_polarnet.py: the reader performs
on-device dynamic voxelization; the backbone produces dense BEV logits;
the head gathers per-point logits.
"""

from flax import linen as nn

from .. import builder
from ..registry import DETECTORS


@DETECTORS.register_module
class SegPolarNet(nn.Module):
    reader: dict = None
    backbone: dict = None
    point_head: dict = None
    neck: dict = None
    bbox_head: dict = None
    pretrained: str = None
    train_cfg: dict = None
    test_cfg: dict = None

    def setup(self):
        self.reader_mod = builder.build_reader(dict(self.reader))
        self.backbone_mod = builder.build_backbone(dict(self.backbone))
        self.point_head_mod = builder.build_point_head(dict(self.point_head))

    @nn.nowrap
    def _make_head(self):
        return builder.build_point_head(dict(self.point_head))

    def __call__(self, example, train: bool = True):
        """example: points [B, N, D], point_valid [B, N],
        (train) point_sem_labels [B, N].

        Supports both readers: PolarNet (dense BEV features -> BEV UNet) and
        Cylinder3D (sparse voxel set -> asymmetric sparse UNet)."""
        batch = dict(example)
        if "PolarNet" in type(self.reader_mod).__name__:
            r = self.reader_mod(
                example["points"], example["point_valid"], train=train
            )
            bev_logits = self.backbone_mod(r["bev_features"], train=train)
            batch["bev_logits"] = bev_logits
        else:  # Cylinder3D dynamic VFE -> sparse backbone
            r = self.reader_mod(
                example["points"], example["point_valid"],
                example.get("point_sem_labels"), train=train,
            )
            out = self.backbone_mod(r["sparse_tensor"], train=train)
            batch.update(out)
            if "voxel_sem_labels" in r:
                batch["voxel_sem_labels"] = r["voxel_sem_labels"]
        batch["point_vcoors"] = r["point_vcoors"]
        ret = self.point_head_mod(batch, train=train)
        return ret, batch

    @nn.nowrap
    def loss(self, ret, batch):
        loss, ldict = self._make_head().get_loss(ret, batch)
        ldict["loss"] = loss
        return loss, ldict

    @nn.nowrap
    def predict(self, ret, batch, test_cfg=None):
        return self._make_head().predict(ret, batch, test_cfg or self.test_cfg)
