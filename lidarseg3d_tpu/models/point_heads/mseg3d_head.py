"""MSeg3D multimodal fusion point head (PointSegMSeg3DHead).

Re-implements /root/reference/det3d/models/point_heads/point_seg_mseg3d_head.py
and context_module.py on padded batches:
- voxel aux classifier (+dropout) and 3-NN devoxelization;
- point camera features via bilinear point-to-pixel sampling;
- cross-modal feature completion: a mimic MLP predicts pseudo-camera
  features from lidar features; MSE mimic loss on in-view points against
  stop-gradient camera features. NOTE: for out-of-view points we follow the
  MSeg3D PAPER (use the predicted pseudo-camera features); the reference
  code as written zero-fills them (point_seg_mseg3d_head.py:302-334 only
  scatters into the valid positions of both pad0 buffers).
- GF-Phase: gffm_lidar/gffm_camera/gffm_lc MLPs;
- SF-Phase: LiDAR semantic embeddings (per-frame softmax over voxels) +
  DETR-style decoder where the per-frame bmm loops of
  SparsePointCorssAttention (context_module.py:304-372) collapse into one
  batched einsum over [B, N, heads, 2*num_cls].
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import grid_sample as gs
from ...ops import interpolate as interp
from ...ops import losses as L
from ..layers import MaskedBatchNorm, MLPHead, TorchLinear
from ..registry import POINT_HEADS


def lidar_semantic_embeddings(feats, logits, valid):
    """feats [B,V,C], logits [B,V,ncls], valid [B,V] -> [B, ncls, C]
    (LiDARSemanticFeatureAggregationModule, context_module.py:18-53):
    per-class softmax over (valid) voxels, then prob-weighted feature sum."""
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(valid[..., None], logits, neg)
    probs = jax.nn.softmax(masked, axis=1)  # over voxels
    return jnp.einsum("bvc,bve->bce", probs, feats)  # c=ncls, e=C


class BatchedPointCrossAttention(nn.Module):
    """Points attend to their frame's 2*num_cls semantic embeddings."""

    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, query, key, value):
        # query [B,N,E]; key/value [B,M,E]
        E, H = self.d_model, self.n_head
        dh = E // H
        q = TorchLinear(E)(query).reshape(*query.shape[:2], H, dh)
        k = TorchLinear(E)(key).reshape(*key.shape[:2], H, dh)
        v = TorchLinear(E)(value).reshape(*value.shape[:2], H, dh)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (dh ** -0.5)
        att = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v)
        return TorchLinear(E)(out.reshape(*query.shape[:2], E))


class SFFMDecoderLayer(nn.Module):
    """Post-norm decoder layer (context_module.py:184-252, dropout=0).
    LayerNorm eps pinned to 1e-5 (torch default) for reference parity."""

    d_model: int
    n_head: int
    n_ffn: int

    @nn.compact
    def __call__(self, carry, _=None):
        # scan-body signature: carry = (tgt, memory); params/stats stacked
        # on a leading n_layer axis by nn.scan (compile the layer ONCE
        # instead of n_layer times — the SFFM was the single largest piece
        # of the flagship's compile graph)
        tgt, memory = carry
        # memory self-attention
        m2 = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.d_model
        )(memory, memory)
        memory = nn.LayerNorm(epsilon=1e-5)(memory + m2)
        # point -> embeddings cross attention
        t2 = BatchedPointCrossAttention(self.d_model, self.n_head)(
            tgt, memory, memory
        )
        tgt = nn.LayerNorm(epsilon=1e-5)(tgt + t2)
        t2 = TorchLinear(self.d_model)(
            jax.nn.relu(TorchLinear(self.n_ffn)(tgt))
        )
        tgt = nn.LayerNorm(epsilon=1e-5)(tgt + t2)
        return (tgt, memory), None


class SemanticFeatureFusionModule(nn.Module):
    d_input_point: int
    d_model: int = 96
    n_head: int = 4
    n_layer: int = 6
    n_ffn: int = 192
    remat: bool = False  # recompute decoder-layer activations in backward:
    # the scan otherwise saves [n_layer, B, N, *] residuals (~10 GB at
    # B=4 full scans), the largest term in the train-step memory

    @nn.compact
    def __call__(self, point_features, sem_emb_camera, sem_emb_lidar):
        """point_features [B,N,Cp]; sem_emb_* [B, ncls, C*] -> [B, N, d_model]."""
        tgt = TorchLinear(self.d_model)(point_features)
        e1 = TorchLinear(self.d_model)(sem_emb_camera)
        e2 = TorchLinear(self.d_model)(sem_emb_lidar)
        memory = jnp.concatenate([e1, e2], axis=1)  # [B, 2*ncls, E]
        ScanLayers = nn.scan(
            nn.remat(SFFMDecoderLayer) if self.remat else SFFMDecoderLayer,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.n_layer,
        )
        (tgt, memory), _ = ScanLayers(
            self.d_model, self.n_head, self.n_ffn, name="SFFMDecoderLayer_0"
        )((tgt, memory))
        return nn.LayerNorm(epsilon=1e-5)(tgt)


@POINT_HEADS.register_module
class PointSegMSeg3DHead(nn.Module):
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
        cfg = self.model_cfg or {}
        feats = batch["conv_point_features"]  # [B, V, C_vox]
        struct = batch["conv_structure"]
        vmask = struct.valid_mask()
        pvalid = batch["point_valid"]
        dp = cfg.get("DP_RATIO", 0)

        # voxel aux head (+ dropout)
        x = feats
        if dp > 0:
            x = nn.Dropout(dp, deterministic=not train)(x)
        voxel_logits = MLPHead(tuple(cfg["VOXEL_CLS_FC"]), self._n_cls)(
            x, mask=vmask, train=train
        )

        # devoxelization -> point lidar features
        pts = batch["points"][..., :3]
        p_lidar0 = interp.grid_three_interpolate(
            pts, pvalid, struct, feats, self.voxel_size, self.point_cloud_range,
            table=batch.get("conv_table"),
            subm_rulebook=batch.get("conv_subm_rulebook"),
        )
        p_lidar = TorchLinear(cfg["VOXEL_ALIGN_DIM"])(p_lidar0)
        p_lidar = MaskedBatchNorm(eps=1e-6)(p_lidar, mask=pvalid, train=train)
        p_lidar = jax.nn.relu(p_lidar)

        # camera features at in-view points
        points_cuv = batch["points_cuv"]  # [B, N, 4]
        in_view = (points_cuv[..., 0] > 0.5) & pvalid
        img_feats = batch["image_features"]  # [B*ncam, h, w, C]
        B = feats.shape[0]
        ncam = img_feats.shape[0] // B
        img5 = img_feats.reshape(B, ncam, *img_feats.shape[1:])
        p_cam0 = gs.sample_points_cuv(img5, points_cuv)
        p_cam = TorchLinear(cfg["IMAGE_ALIGN_DIM"])(p_cam0)
        p_cam = MaskedBatchNorm(eps=1e-6)(p_cam, mask=in_view, train=train)
        p_cam = jax.nn.relu(p_cam)

        # cross-modal completion: pseudo-camera features from lidar.
        # OOV_COMPLETION selects what out-of-view points carry downstream:
        #   "pseudo_camera" (default) - the mimicked features, as described
        #       in the MSeg3D paper (arXiv 2303.08600 sec 3.3)
        #   "zero" - reference-code parity: the released implementation
        #       zero-fills OOV camera features and uses p_pcam only for the
        #       mimic loss (point_seg_mseg3d_head.py:314-334)
        p_pcam = MLPHead(
            tuple(cfg["MIMIC_FC"]), cfg["IMAGE_ALIGN_DIM"], bn_eps=1e-5
        )(p_lidar, mask=in_view, train=train)
        if cfg.get("OOV_COMPLETION", "pseudo_camera") == "zero":
            p_ccam = jnp.where(in_view[..., None], p_cam, 0.0)
        else:
            p_ccam = jnp.where(in_view[..., None], p_cam, p_pcam)
        p_ccam = p_ccam * pvalid[..., None]

        # GF-Phase
        geo = TorchLinear(cfg["GEO_FUSED_DIM"])(
            jnp.concatenate([p_lidar, p_ccam], axis=-1)
        )
        geo = MaskedBatchNorm()(geo, mask=pvalid, train=train)
        geo = jax.nn.relu(geo)

        # SF-Phase
        lidar_emb = lidar_semantic_embeddings(feats, voxel_logits, vmask)
        sf_cfg = cfg["SFPhase_CFG"]
        fused = SemanticFeatureFusionModule(
            d_input_point=cfg["GEO_FUSED_DIM"],
            d_model=sf_cfg["d_model"], n_head=sf_cfg["n_head"],
            n_layer=sf_cfg["n_layer"], n_ffn=sf_cfg["n_ffn"],
            remat=bool(cfg.get("ACT_REMAT", False)),
        )(geo, batch["camera_semantic_embeddings"], lidar_emb)

        out_logits = TorchLinear(self.num_class)(fused)
        return {
            "voxel_logits": voxel_logits,
            "out_logits": out_logits,
            "point_features_pcamera": p_pcam,
            "point_features_camera": p_cam,
            "in_view": in_view,
        }

    def get_loss(self, ret, batch):
        cfg = self.model_cfg or {}
        ignored = cfg.get("IGNORED_LABEL", 0)
        n_cls = self._n_cls

        vl = ret["voxel_logits"].reshape(-1, n_cls)
        vlab = batch["voxel_sem_labels"].reshape(-1)
        vval = batch["voxel_valid"].reshape(-1)
        voxel_ce = L.cross_entropy(vl, vlab, ignored, valid=vval)
        voxel_lvsz = L.lovasz_softmax(
            jax.nn.softmax(vl, -1), vlab, ignore=ignored, valid=vval
        )

        ol = ret["out_logits"].reshape(-1, n_cls)
        plab = batch["point_sem_labels"].reshape(-1)
        pval = batch["point_valid"].reshape(-1)
        out_ce = L.cross_entropy(ol, plab, ignored, valid=pval)
        out_lvsz = L.lovasz_softmax(
            jax.nn.softmax(ol, -1), plab, ignore=ignored, valid=pval
        )

        # mimic MSE on in-view points, camera side stop-gradient
        iv = ret["in_view"][..., None].astype(ol.dtype)
        diff = (
            ret["point_features_pcamera"]
            - jax.lax.stop_gradient(ret["point_features_camera"])
        ) * iv
        mimic = jnp.sum(diff ** 2) / jnp.maximum(
            jnp.sum(iv) * diff.shape[-1], 1.0
        )

        loss = voxel_ce + voxel_lvsz + out_ce + out_lvsz + mimic
        return loss, {
            "voxel_ce_loss": voxel_ce, "voxel_lovasz_loss": voxel_lvsz,
            "out_ce_loss": out_ce, "out_lovasz_loss": out_lvsz,
            "out_mimic_loss": mimic,
        }

    @staticmethod
    def predict(ret, batch, test_cfg=None):
        logits = ret["out_logits"]
        return {
            "pred_point_sem_labels": jnp.argmax(logits, axis=-1),
            "point_valid": batch["point_valid"],
            "point_softmax": jax.nn.softmax(logits, axis=-1),
        }
