"""PolarNet point head: gather per-point logits from the dense BEV grid.

Re-implements det3d/models/point_heads/point_seg_polarnet_head.py: point
logits = bev_logits[vcoors], point-level CE + Lovász (memory-light
"serialize first, then loss" trick, :55-63 comments).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ..registry import POINT_HEADS


@POINT_HEADS.register_module
class PointSegPolarNetHead(nn.Module):
    class_agnostic: bool = False
    num_class: int = 17
    model_cfg: dict = None

    @property
    def _n_cls(self):
        return 1 if self.class_agnostic else self.num_class

    @nn.compact
    def __call__(self, batch, train: bool = True):
        """batch: bev_logits [B, R, P, Z, C], point_vcoors [B, N, 3] (r,p,z),
        point_valid [B, N]."""
        logits = batch["bev_logits"]
        B, R, P, Z, C = logits.shape
        vc = batch["point_vcoors"]
        flat = logits.reshape(B * R * P * Z, C)
        idx = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * (R * P * Z)
            + vc[..., 0] * (P * Z) + vc[..., 1] * Z + vc[..., 2]
        )
        point_logits = jnp.take(flat, idx.reshape(-1), axis=0).reshape(B, -1, C)
        return {"out_logits": point_logits}

    def get_loss(self, ret, batch):
        ignored = (self.model_cfg or {}).get("IGNORED_LABEL", 0)
        n_cls = self._n_cls
        out_logits = ret["out_logits"].reshape(-1, n_cls)
        labels = batch["point_sem_labels"].reshape(-1)
        valid = batch["point_valid"].reshape(-1)
        ce = L.cross_entropy(out_logits, labels, ignored, valid=valid)
        lvsz = L.lovasz_softmax(
            jax.nn.softmax(out_logits, -1), labels, ignore=ignored, valid=valid
        )
        loss = ce + lvsz
        return loss, {"out_ce_loss": ce, "out_lvsz_loss": lvsz}

    @staticmethod
    def predict(ret, batch, test_cfg=None):
        logits = ret["out_logits"]
        return {
            "pred_point_sem_labels": jnp.argmax(logits, axis=-1),
            "point_valid": batch["point_valid"],
            "point_softmax": jax.nn.softmax(logits, axis=-1),
        }
