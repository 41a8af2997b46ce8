"""Second-stage RoI head (CenterPoint two-stage refinement).

Re-implements /root/reference/det3d/models/roi_heads/roi_head.py:17 +
roi_head_template.py (OpenPCDet lineage) functionally:

- shared MLP over per-roi feature vectors, cls (IoU score) + reg branches
- generate_predicted_boxes: residuals decoded in the roi canonical frame
  (rotate by roi yaw, translate by roi center)
- target assignment (proposal_target_layer): per-roi max-3D-IoU gt match,
  gt-of-roi encoded in the canonical frame with opposite-heading flip,
  IoU-interpolated cls labels.

Static-shape deviation from the reference (documented): instead of
subsampling ROI_PER_IMAGE rois with fg/bg ratio balancing, ALL
NMS_POST_MAXSIZE rois are kept and the losses use the same fg/valid masks
with mean-over-fg normalization — the estimator the sampler approximates.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops
from ..layers import MaskedBatchNorm, TorchLinear
from ..registry import ROI_HEAD


def encode_gt_of_rois(rois, gt_boxes):
    """gt boxes -> roi canonical frame (proposal_target_layer.py):
    translate by -roi_xyz, rotate xy by -roi_ry, dims residual to the roi
    dims (reference roi_head_template.py:54 subtracts rois[:, :, :6] —
    center AND dims), heading = wrapped (gt_ry - roi_ry) flipped into
    [-pi/2, pi/2]. Residual dims keep decode's `rcnn_reg + roi_dims`
    consistent with the loss target."""
    ct = gt_boxes[..., :3] - rois[..., :3]
    ry = rois[..., 6]
    ct = box_ops.rotate_points_along_z(ct, -ry)
    dims = gt_boxes[..., 3:6] - rois[..., 3:6]
    rel = gt_boxes[..., 6] - ry
    rel = jnp.mod(rel + jnp.pi, 2 * jnp.pi) - jnp.pi
    flip = jnp.abs(rel) > jnp.pi / 2
    rel = jnp.where(flip, rel - jnp.sign(rel) * jnp.pi, rel)
    return jnp.concatenate([ct, dims, rel[..., None]], axis=-1)


def assign_targets(rois, roi_labels, gt_boxes, gt_classes, gt_valid, cfg):
    """Per-roi targets. rois [B, N, 7]; gt_boxes [B, G, 7]; gt_classes
    [B, G] (1-based); gt_valid [B, G] bool.
    Returns dict(gt_of_rois [B, N, 7], reg_fg [B, N], cls_labels [B, N])."""
    fg_thresh = cfg.get("REG_FG_THRESH", 0.55)
    cls_fg = cfg.get("CLS_FG_THRESH", 0.75)
    cls_bg = cfg.get("CLS_BG_THRESH", 0.25)

    def one(rois_b, rlab_b, gt_b, gcls_b, gval_b):
        iou = box_ops.boxes_iou_3d(rois_b, gt_b)  # [N, G]
        same_cls = rlab_b[:, None] == gcls_b[None, :]
        iou = jnp.where(same_cls & gval_b[None, :], iou, -1.0)
        best = jnp.argmax(iou, axis=1)
        max_iou = jnp.max(iou, axis=1)
        matched_gt = gt_b[best]
        return matched_gt, jnp.clip(max_iou, 0.0)

    matched, max_iou = jax.vmap(one)(rois, roi_labels, gt_boxes, gt_classes,
                                     gt_valid)
    gt_of_rois = encode_gt_of_rois(rois, matched)
    reg_fg = max_iou > fg_thresh
    # CLS_SCORE_TYPE = roi_iou: interpolate between bg and fg thresholds
    cls_labels = jnp.clip((max_iou - cls_bg) / (cls_fg - cls_bg), 0.0, 1.0)
    return dict(gt_of_rois=gt_of_rois, reg_fg=reg_fg, cls_labels=cls_labels)


@ROI_HEAD.register_module
class RoIHead(nn.Module):
    input_channels: int = 0
    model_cfg: dict = None
    num_class: int = 1
    code_size: int = 7
    test_cfg: dict = None

    @nn.compact
    def __call__(self, roi_features, roi_valid, train: bool = True):
        """roi_features [B, N, C]; roi_valid [B, N] bool.
        Returns (rcnn_cls [B, N, num_class], rcnn_reg [B, N, code_size])."""
        cfg = dict(self.model_cfg or {})
        dp = float(cfg.get("DP_RATIO", 0.3))
        x = roi_features
        shared = list(cfg.get("SHARED_FC", (256, 256)))
        for i, f in enumerate(shared):
            x = TorchLinear(f, use_bias=False)(x)
            x = MaskedBatchNorm(eps=1e-5, momentum=0.1)(
                x, mask=roi_valid, train=train)
            x = jax.nn.relu(x)
            if i != len(shared) - 1 and dp > 0:
                x = nn.Dropout(dp, deterministic=not train)(x)

        def branch(x, fcs, out_dim):
            for f in fcs:
                x = TorchLinear(f, use_bias=False)(x)
                x = MaskedBatchNorm(eps=1e-5, momentum=0.1)(
                    x, mask=roi_valid, train=train)
                x = jax.nn.relu(x)
                if dp > 0:
                    x = nn.Dropout(dp, deterministic=not train)(x)
            return TorchLinear(out_dim)(x)

        rcnn_cls = branch(x, list(cfg.get("CLS_FC", (256, 256))),
                          self.num_class)
        rcnn_reg = branch(x, list(cfg.get("REG_FC", (256, 256))),
                          self.code_size)
        return rcnn_cls, rcnn_reg

    @staticmethod
    def generate_predicted_boxes(rois, rcnn_reg):
        """Decode canonical-frame residuals (roi_head_template.py:153-182):
        box = rotate(reg + [0, 0, 0, roi_dims, roi_ry], roi_ry) + roi_xyz."""
        local = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:]], axis=-1)
        pred = rcnn_reg + local
        xyz = box_ops.rotate_points_along_z(pred[..., :3], rois[..., 6])
        xyz = xyz + rois[..., :3]
        return jnp.concatenate([xyz, pred[..., 3:]], axis=-1)

    @staticmethod
    def get_loss(rcnn_cls, rcnn_reg, targets, roi_valid, cfg=None):
        """BinaryCrossEntropy IoU-score loss + fg-masked L1 reg loss
        (roi_head_template.py:88-151)."""
        cfg = dict(cfg or {})
        w = cfg.get("LOSS_WEIGHTS",
                    {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                     "code_weights": [1.0] * 7})
        cls_flat = rcnn_cls.reshape(-1)
        labels = targets["cls_labels"].reshape(-1)
        valid = roi_valid.reshape(-1).astype(jnp.float32)
        p = jax.nn.sigmoid(cls_flat)
        bce = -(labels * jnp.log(jnp.clip(p, 1e-7, 1.0))
                + (1 - labels) * jnp.log(jnp.clip(1 - p, 1e-7, 1.0)))
        cls_loss = jnp.sum(bce * valid) / jnp.maximum(valid.sum(), 1.0)

        code_w = jnp.asarray(w.get("code_weights", [1.0] * 7))
        reg = rcnn_reg.reshape(-1, rcnn_reg.shape[-1])
        tgt = targets["gt_of_rois"].reshape(-1, reg.shape[-1])
        fg = (targets["reg_fg"].reshape(-1) & (roi_valid.reshape(-1))
              ).astype(jnp.float32)
        l1 = jnp.abs(reg - tgt) * code_w[None, :]
        reg_loss = jnp.sum(l1.sum(-1) * fg) / jnp.maximum(fg.sum(), 1.0)

        cls_loss = cls_loss * w.get("rcnn_cls_weight", 1.0)
        reg_loss = reg_loss * w.get("rcnn_reg_weight", 1.0)
        return cls_loss + reg_loss, {
            "rcnn_loss_cls": cls_loss, "rcnn_loss_reg": reg_loss,
        }
