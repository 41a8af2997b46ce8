"""PointPillars detector: PFN reader -> BEV scatter -> RPN -> CenterHead.

Re-implements /root/reference/det3d/models/detectors/point_pillars.py:10 on
the padded [B, V, P, D] pillar layout. Loss/predict mirror VoxelNet (the
reference classes share BaseDetector the same way).
"""

from flax import linen as nn

from .. import builder
from ..registry import DETECTORS, HEADS
from ...utils.registry import build_from_cfg


@DETECTORS.register_module
class PointPillars(nn.Module):
    reader: dict = None
    backbone: dict = None  # PointPillarsScatter
    neck: dict = None
    bbox_head: dict = None
    pretrained: str = None
    train_cfg: dict = None
    test_cfg: dict = None

    def setup(self):
        self.reader_mod = builder.build_reader(dict(self.reader))
        self.backbone_mod = builder.build_backbone(dict(self.backbone))
        self.neck_mod = builder.build_neck(dict(self.neck))
        self.head_mod = build_from_cfg(dict(self.bbox_head), HEADS)

    @nn.nowrap
    def _make_head(self):
        return build_from_cfg(dict(self.bbox_head), HEADS)

    def __call__(self, example, train: bool = True):
        pillar_features = self.reader_mod(
            example["voxels"], example["num_points"], example["coordinates"],
            train=train,
        )
        bev = self.backbone_mod(
            pillar_features, example["coordinates"], example["num_voxels"],
            example["input_shape"], train=train,
        )
        feats = self.neck_mod(bev, train=train)
        rets = self.head_mod(feats, train=train)
        batch = dict(example)
        batch["bev_feature"] = feats
        return rets, batch

    @nn.nowrap
    def loss(self, rets, batch):
        total, ldict = self._make_head().get_loss(rets, batch["det_targets"])
        ldict["loss"] = total
        return total, ldict

    @nn.nowrap
    def predict(self, rets, batch, test_cfg=None):
        # identical decode/merge path as VoxelNet
        from .voxelnet import VoxelNet

        return VoxelNet.predict(self, rets, batch, test_cfg)
