"""SDSeg3D point head with batch-wise loss (PointSegBatchlossHead).

Re-implements /root/reference/det3d/models/point_heads/point_seg_batchloss_head.py:
voxel-level classifier MLP, 3-NN devoxelization to raw points, align MLP +
point classifier; losses = CE + Lovász at both voxel and point level.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import interpolate as interp
from ...ops import losses as L
from ..layers import MaskedBatchNorm, MLPHead, TorchLinear
from ..registry import POINT_HEADS


@POINT_HEADS.register_module
class PointSegBatchlossHead(nn.Module):
    class_agnostic: bool = False
    num_class: int = 20
    model_cfg: dict = None
    voxel_size: tuple = ()
    point_cloud_range: tuple = ()

    @property
    def _n_cls(self):
        return 1 if self.class_agnostic else self.num_class

    @nn.compact
    def __call__(self, batch, train: bool = True):
        """batch keys used:
        conv_point_features [B,V,C], conv_point_coords [B,V,3] (metric),
        conv_structure, conv_table, points [B,N,D], point_valid [B,N].
        Returns dict(conv_logits [B,V,n_cls], out_logits [B,N,n_cls]).
        """
        cfg = self.model_cfg or {}
        feats = batch["conv_point_features"]
        struct = batch["conv_structure"]
        vmask = struct.valid_mask()

        conv_logits = MLPHead(
            tuple(cfg["CONV_CLS_FC"]), self._n_cls
        )(feats, mask=vmask, train=train)

        # 3-NN devoxelization (point_utils.py:8-52 -> grid-27 lookup here)
        pts = batch["points"][..., :3]
        pvalid = batch["point_valid"]
        point_conv_feats = interp.grid_three_interpolate(
            pts, pvalid, struct, feats, self.voxel_size, self.point_cloud_range,
            table=batch.get("conv_table"),
            subm_rulebook=batch.get("conv_subm_rulebook"),
        )

        x = TorchLinear(cfg["CONV_ALIGN_DIM"])(point_conv_feats)
        x = MaskedBatchNorm(eps=1e-6)(x, mask=pvalid, train=train)
        x = jax.nn.relu(x)
        out_logits = MLPHead(tuple(cfg["OUT_CLS_FC"]), self._n_cls)(
            x, mask=pvalid, train=train
        )
        return {"conv_logits": conv_logits, "out_logits": out_logits}

    def get_loss(self, ret, batch):
        """CE + Lovász at voxel and point level (batch-wise, :78-119)."""
        cfg = self.model_cfg or {}
        ignored = cfg.get("IGNORED_LABEL", 0)
        n_cls = self._n_cls

        conv_logits = ret["conv_logits"].reshape(-1, n_cls)
        vlabels = batch["voxel_sem_labels"].reshape(-1)
        vvalid = batch["voxel_valid"].reshape(-1)
        conv_ce = L.cross_entropy(conv_logits, vlabels, ignored, valid=vvalid)
        conv_lvsz = L.lovasz_softmax(
            jax.nn.softmax(conv_logits, axis=-1), vlabels, ignore=ignored,
            valid=vvalid,
        )

        out_logits = ret["out_logits"].reshape(-1, n_cls)
        plabels = batch["point_sem_labels"].reshape(-1)
        pvalid = batch["point_valid"].reshape(-1)
        out_ce = L.cross_entropy(out_logits, plabels, ignored, valid=pvalid)
        out_lvsz = L.lovasz_softmax(
            jax.nn.softmax(out_logits, axis=-1), plabels, ignore=ignored,
            valid=pvalid,
        )

        loss = conv_ce + conv_lvsz + out_ce + out_lvsz
        return loss, {
            "conv_ce_loss": conv_ce,
            "conv_lovasz_loss": conv_lvsz,
            "out_ce_loss": out_ce,
            "out_lovasz_loss": out_lvsz,
        }

    @staticmethod
    def predict(ret, batch, test_cfg=None):
        """Decode point logits to labels. TTA merging (ArithmeticMean over
        softmax of num_tta_tranforms variants) happens at the batch level:
        variants are separate batch rows; see apis/eval.py."""
        logits = ret["out_logits"]
        return {
            "pred_point_sem_labels": jnp.argmax(logits, axis=-1),
            "point_valid": batch["point_valid"],
            "point_softmax": jax.nn.softmax(logits, axis=-1),
        }
