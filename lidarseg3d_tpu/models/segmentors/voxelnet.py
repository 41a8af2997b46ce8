"""VoxelNet: CenterPoint-style single-stage 3D detector.

Re-implements /root/reference/det3d/models/detectors/voxelnet.py:8 with the
TPU stack: VFE reader -> SpMiddleResNetFHD -> RPN -> CenterHead. Targets are
host-assigned (core/center_targets.py).
"""

from flax import linen as nn

from ...ops import sparse as sp
from .. import builder
from ..registry import DETECTORS
from ...utils.registry import build_from_cfg
from ..registry import HEADS


@DETECTORS.register_module
class VoxelNet(nn.Module):
    reader: dict = None
    backbone: dict = None
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
        voxel_features = self.reader_mod(
            example["voxels"], example["num_points"], example["coordinates"],
            train=train,
        )
        struct = sp.build_structure(
            example["coordinates"], example["num_voxels"],
            example["input_shape"],
        )
        st = sp.SparseTensor(structure=struct, features=voxel_features)
        bev = self.backbone_mod(st, train=train)
        feats = self.neck_mod(bev, train=train)
        rets = self.head_mod(feats, train=train)
        batch = dict(example)
        # the neck output doubles as the second stage's BEV feature map
        # (reference forward_two_stage, detectors/voxelnet.py)
        batch["bev_feature"] = feats
        return rets, batch

    @nn.nowrap
    def loss(self, rets, batch):
        total, ldict = self._make_head().get_loss(rets, batch["det_targets"])
        ldict["loss"] = total
        return total, ldict

    @nn.nowrap
    def predict(self, rets, batch, test_cfg=None):
        """Decode per task, then merge tasks with global class offsets
        (the reference's post_processing concat, detectors/voxelnet.py).
        Returns dict(box3d_lidar [B, T*max_out, 7], scores, label_preds,
        valid) plus the per-task list under "tasks"."""
        import jax.numpy as jnp

        from ..bbox_heads.center_head import CenterHead

        cfg = dict(test_cfg or self.test_cfg or {})
        # static decode: no module construction, so this is also callable
        # from INSIDE a parent module's __call__ (TwoStageDetector proposals)
        outs = CenterHead.decode(
            rets,
            voxel_size=cfg.get("voxel_size", (0.1, 0.1)),
            pc_range=cfg.get("pc_range", (-75.2, -75.2)),
            out_factor=cfg.get("out_size_factor", 8),
            score_threshold=cfg.get("score_threshold", 0.1),
            nms_iou=cfg.get("nms_iou_threshold", 0.5),
            max_out=cfg.get("max_out", 83),
            # circle NMS (nusc configs: circular_nms + per-task min_radius,
            # reference center_head.py:473-476)
            nms_type="circle" if cfg.get("circular_nms") else "rotated",
            min_radius=cfg.get("min_radius"),
            # double-flip TTA: batch rows come in groups of 4 flip variants
            # (DoubleFlip pipeline stage); merge before decoding
            double_flip=bool(cfg.get("double_flip", False)),
        )
        offsets, off = [], 0
        for t in dict(self.bbox_head).get("tasks", [{}] * len(outs)):
            offsets.append(off)
            off += int(t.get("num_class", 1)) if isinstance(t, dict) else 1
        merged = {
            "box3d_lidar": jnp.concatenate([o["box3d"] for o in outs], 1),
            "scores": jnp.concatenate([o["scores"] for o in outs], 1),
            "label_preds": jnp.concatenate(
                [o["labels"] + offs for o, offs in zip(outs, offsets)], 1),
            "valid": jnp.concatenate([o["valid"] for o in outs], 1),
            "tasks": outs,
        }
        if all("velocity" in o for o in outs):
            merged["velocity"] = jnp.concatenate(
                [o["velocity"] for o in outs], 1)
        return merged
