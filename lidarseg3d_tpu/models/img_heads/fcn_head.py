"""Plain FCN decode head (cf. det3d/models/img_heads/fcn_head.py:12).

Single-scale or resize-concat inputs, num_convs 3x3 blocks, classifier.
Used standalone for image-only segmentation experiments.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ..img_backbones.hrnet import ConvBNReLU
from ..registry import IMG_HEADS
from ...ops.resize import resize_bilinear


@IMG_HEADS.register_module
class FCNHead(nn.Module):
    in_channels: tuple = (18, 36, 72, 144)
    in_index: tuple = (0, 1, 2, 3)
    channels: int = 270
    num_convs: int = 1
    kernel_size: int = 1
    concat_input: bool = False
    num_classes: int = 19
    dropout_ratio: float = -1.0
    input_transform: str = "resize_concat"
    align_corners: bool = False
    ignore_index: int = 0
    loss_weight: float = 1.0
    norm_cfg: dict = None
    loss_decode: dict = None

    @nn.compact
    def __call__(self, inputs, batch_size=None, train: bool = True):
        if self.input_transform == "resize_concat":
            tgt = inputs[self.in_index[0]]
            ups = [tgt] + [
                resize_bilinear(inputs[i], (tgt.shape[1], tgt.shape[2]))
                for i in self.in_index[1:]
            ]
            x = jnp.concatenate(ups, axis=-1)
        else:
            x = inputs[self.in_index if isinstance(self.in_index, int) else
                       self.in_index[0]]
        feats = x
        for _ in range(self.num_convs):
            feats = ConvBNReLU(self.channels, kernel=self.kernel_size)(
                feats, train
            )
        if self.concat_input:
            feats = ConvBNReLU(self.channels, kernel=self.kernel_size)(
                jnp.concatenate([x, feats], axis=-1), train
            )
        if self.dropout_ratio > 0:
            feats = nn.Dropout(self.dropout_ratio,
                               deterministic=not train)(feats)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=feats.dtype)(feats)
        # loss consumers always see fp32 (inputs may be bf16 when the
        # backbone runs mixed precision, see HRNet.compute_dtype)
        return {"image_features": feats.astype(jnp.float32),
                "image_logits": logits.astype(jnp.float32)}

    def get_loss(self, ret, batch):
        logits = ret["image_logits"]
        labels = batch["images_sem_labels"]
        BN, H, W = labels.shape
        logits = resize_bilinear(logits, (H, W))
        ce = self.loss_weight * L.cross_entropy(
            logits.reshape(-1, logits.shape[-1]), labels.reshape(-1),
            self.ignore_index,
        )
        return ce, {"image_ce_loss": ce}
