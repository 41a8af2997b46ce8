"""TwoStageDetector: CenterPoint-style box refinement.

Re-implements /root/reference/det3d/models/detectors/two_stage.py:9 on
static shapes: first-stage VoxelNet/PointPillars proposals (topK + NMS,
fixed NMS_POST_MAXSIZE rows with validity masks) -> BEV feature extraction
at box centers (num_point 1 or 5) -> RoIHead IoU-rectified scoring and box
refinement. score = sqrt(sigmoid(iou_pred) * first_stage_score)
(two_stage.py:133).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import builder
from ..registry import DETECTORS, HEADS, SECOND_STAGE, ROI_HEAD
from ...utils.registry import build_from_cfg
from ..second_stage.bev_extractor import box_sample_points


@DETECTORS.register_module
class TwoStageDetector(nn.Module):
    first_stage_cfg: dict = None
    second_stage_modules: tuple = ()
    roi_head: dict = None
    NMS_POST_MAXSIZE: int = 83
    num_point: int = 1
    freeze: bool = False
    train_cfg: dict = None
    test_cfg: dict = None

    def setup(self):
        first = dict(self.first_stage_cfg)
        first.pop("pretrained", None)
        self.single_det = builder.build_detector(
            first, train_cfg=self.train_cfg, test_cfg=self.test_cfg)
        self.second_stage = [
            build_from_cfg(dict(m), SECOND_STAGE)
            for m in self.second_stage_modules
        ]
        self.roi_head_mod = build_from_cfg(dict(self.roi_head), ROI_HEAD)

    @nn.nowrap
    def _roi_head(self):
        return build_from_cfg(dict(self.roi_head), ROI_HEAD)

    def __call__(self, example, train: bool = True):
        # freeze=True (reference two_stage.py: single_det.freeze()) stops
        # gradients AND BN stat updates on the first stage during fine-tune.
        rets, batch = self.single_det(
            example, train=train and not self.freeze)
        if self.freeze:
            rets = jax.tree_util.tree_map(jax.lax.stop_gradient, rets)
            batch = {
                k: (jax.lax.stop_gradient(v)
                    if isinstance(v, jnp.ndarray) else v)
                for k, v in batch.items()
            }
        # first-stage proposals (static [B, max_out] per task, merged)
        test_cfg = dict(self.test_cfg or {})
        props = self.single_det.predict(
            rets, batch, test_cfg={**test_cfg,
                                   "max_out": self.NMS_POST_MAXSIZE})
        rois = props["box3d_lidar"]  # [B, M, 7]
        roi_scores = props["scores"]
        roi_valid = props["valid"]
        roi_labels = props["label_preds"] + 1  # 1-based (two_stage.py:110)

        centers = box_sample_points(
            jax.lax.stop_gradient(rois), self.num_point)
        feats = []
        for mod in self.second_stage:
            f = mod(batch["bev_feature"], centers)  # [B, M*np, C]
            if self.num_point > 1:
                B, MP, C = f.shape
                M = MP // self.num_point
                f = f.reshape(B, self.num_point, M, C)
                f = jnp.moveaxis(f, 1, 2).reshape(B, M, self.num_point * C)
            feats.append(f)
        roi_features = jnp.concatenate(feats, axis=-1)

        rcnn_cls, rcnn_reg = self.roi_head_mod(
            roi_features, roi_valid, train=train)
        return {
            "first_stage": rets,
            "rois": rois,
            "roi_scores": roi_scores,
            "roi_labels": roi_labels,
            "roi_valid": roi_valid,
            "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
        }, batch

    @nn.nowrap
    def loss(self, rets, batch):
        # called OUTSIDE apply: setup() hasn't run, so build an unbound
        # first-stage module (its loss only uses static head methods)
        from ..roi_heads.roi_head import assign_targets

        if self.freeze:
            # frozen first stage contributes no loss term (reference
            # freeze() detaches it from the training objective)
            one_total, ldict = 0.0, {}
        else:
            first = dict(self.first_stage_cfg)
            first.pop("pretrained", None)
            single = builder.build_detector(
                first, train_cfg=self.train_cfg, test_cfg=self.test_cfg)
            one_total, ldict = single.loss(rets["first_stage"], batch)
        rh = self._roi_head()
        gt = batch["gt_boxes_and_cls"]  # [B, G, 8] (7 box + class, 1-based)
        gt_valid = gt[..., 3] > 0  # zero-padded rows have zero dims
        targets = assign_targets(
            jax.lax.stop_gradient(rets["rois"]), rets["roi_labels"],
            gt[..., :7], gt[..., 7].astype(jnp.int32), gt_valid,
            dict(rh.model_cfg or {}).get("TARGET_CONFIG", {}),
        )
        roi_total, roi_ld = rh.get_loss(
            rets["rcnn_cls"], rets["rcnn_reg"], targets,
            rets["roi_valid"],
            dict(rh.model_cfg or {}).get("LOSS_CONFIG", {}),
        )
        total = one_total + roi_total
        ldict = dict(ldict)
        ldict.update(roi_ld)
        ldict["loss"] = total
        return total, ldict

    @nn.nowrap
    def predict(self, rets, batch, test_cfg=None):
        """IoU-rectified final boxes (two_stage.py:120-150)."""
        rh = self._roi_head()
        boxes = rh.generate_predicted_boxes(rets["rois"], rets["rcnn_reg"])
        iou = jax.nn.sigmoid(rets["rcnn_cls"][..., 0])
        scores = jnp.sqrt(jnp.clip(iou * rets["roi_scores"], 0.0))
        return {
            "box3d_lidar": boxes,
            "scores": jnp.where(rets["roi_valid"], scores, 0.0),
            "label_preds": rets["roi_labels"] - 1,
            "valid": rets["roi_valid"],
        }
