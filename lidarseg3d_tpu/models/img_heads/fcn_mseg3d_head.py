"""FCN decode head for MSeg3D's camera branch.

Re-implements /root/reference/det3d/models/img_heads/fcn_mseg3d_head.py:55:
resize-concat of the HRNet pyramid, num_convs 3x3 ConvModules, classifier,
camera semantic embeddings (softmax over all pixels of all cameras per
frame, matmul with features), and the sparse-pixel CE (+optional Lovász)
loss against point-painted labels.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ..img_backbones.hrnet import ConvBNReLU
from ..registry import IMG_HEADS
from ...ops.resize import resize_bilinear


def camera_semantic_embeddings(feats, logits, batch_size):
    """feats/logits: [B*ncam, h, w, C/ncls] -> [B, ncls, C]
    (CameraSemanticFeatureAggregationModule, fcn_mseg3d_head.py:17-51)."""
    BN, h, w, C = feats.shape
    ncls = logits.shape[-1]
    ncam = BN // batch_size
    f = feats.reshape(batch_size, ncam * h * w, C)
    p = logits.reshape(batch_size, ncam * h * w, ncls)
    p = jax.nn.softmax(p, axis=1)  # softmax over ALL pixels of all cams
    return jnp.einsum("bpc,bpe->bce", p, f)  # [B, ncls, C_feat]


@IMG_HEADS.register_module
class FCNMSeg3DHead(nn.Module):
    in_channels: tuple = (18, 36, 72, 144)
    in_index: tuple = (0, 1, 2, 3)
    channels: int = 48
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    num_classes: int = 20
    ignore_index: int = 0
    loss_weight: float = 1.0
    lovasz_loss_weight: float = -1.0
    dropout_ratio: float = -1.0
    input_transform: str = "resize_concat"
    align_corners: bool = False
    norm_cfg: dict = None
    use_sc_conv: bool = False
    conv_seg_kernel: int = 1
    compute_dtype: str = None  # mixed-precision convs (see hrnet.conv);
    # outputs (features/logits/embeddings) are always cast back to fp32

    @nn.compact
    def __call__(self, inputs, batch_size, train: bool = True):
        """inputs: list of [B*ncam, h_i, w_i, C_i] HRNet maps.
        Returns dict(image_features [B*ncam, h, w, channels],
                     image_logits [B*ncam, h, w, ncls],
                     camera_semantic_embeddings [B, ncls, channels])."""
        if self.compute_dtype is not None:
            dt = jnp.dtype(self.compute_dtype)
            inputs = [x.astype(dt) for x in inputs]
        # resize-concat to the finest scale
        tgt = inputs[self.in_index[0]]
        ups = [tgt]
        for i in self.in_index[1:]:
            x = inputs[i]
            ups.append(resize_bilinear(x, (tgt.shape[1], tgt.shape[2])))
        x = jnp.concatenate(ups, axis=-1)
        feats = x
        for i in range(self.num_convs):
            if self.use_sc_conv and i > 0:
                # reference replaces convs 1..n-1 with SCBottlenecks when
                # use_sc_conv=True (fcn_mseg3d_head.py:100-113)
                from .sc_conv import SCBottleneck

                feats = SCBottleneck(self.channels)(feats, train)
            else:
                feats = ConvBNReLU(self.channels, kernel=self.kernel_size)(
                    feats, train
                )
        if self.concat_input:
            feats = ConvBNReLU(self.channels, kernel=self.kernel_size)(
                jnp.concatenate([x, feats], axis=-1), train
            )
        logits = nn.Conv(
            self.num_classes, (self.conv_seg_kernel, self.conv_seg_kernel),
            dtype=feats.dtype,
        )(feats)
        # loss / fusion consumers always see fp32
        feats = feats.astype(jnp.float32)
        logits = logits.astype(jnp.float32)
        emb = camera_semantic_embeddings(feats, logits, batch_size)
        return {
            "image_features": feats,
            "image_logits": logits,
            "camera_semantic_embeddings": emb,
        }

    def get_loss(self, ret, batch):
        """Pixel CE on sparse point-painted labels (fcn_mseg3d_head.py:202-244).
        batch["images_sem_labels"]: [B*ncam, H, W] int (ignore_index for
        unlabeled pixels), at the ORIGINAL image resolution."""
        logits = ret["image_logits"]
        labels = batch["images_sem_labels"]
        BN, H, W = labels.shape
        logits = resize_bilinear(logits, (H, W))
        flat_logits = logits.reshape(-1, logits.shape[-1])
        flat_labels = labels.reshape(-1)
        ce = self.loss_weight * L.cross_entropy(
            flat_logits, flat_labels, self.ignore_index
        )
        loss = ce
        ldict = {"image_ce_loss": ce}
        if self.lovasz_loss_weight > 0:
            lvsz = self.lovasz_loss_weight * L.lovasz_softmax(
                jax.nn.softmax(flat_logits, -1), flat_labels,
                ignore=self.ignore_index,
            )
            loss = loss + lvsz
            ldict["image_lvsz_loss"] = lvsz
        return loss, ldict
