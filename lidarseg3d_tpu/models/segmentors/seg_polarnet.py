"""SegPolarNet: dynamic-VFE segmentor (PolarNet / Cylinder3D family).

Re-implements det3d/models/detectors/seg_polarnet.py: the reader performs
on-device dynamic voxelization; the backbone produces dense BEV logits
(PolarNet / Cylinder3D) or sparse per-voxel features (Cylinder3D _v2p, fed
to a PointSegBatchlossHead with devoxelization in CYLINDRICAL metric space).
"""

import numpy as np
from flax import linen as nn

from ...ops import dynamic_voxel as dv
from ...ops import sparse as sp
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
        self.point_head_mod = self._make_head()

    @nn.nowrap
    def _make_head(self):
        ph = dict(self.point_head)
        if ph.get("type") == "PointSegBatchlossHead":
            # v2p path: devoxelize on the cylindrical grid — voxel_size /
            # range in (rho, phi, z) metric axes
            lo = np.asarray(self.reader["point_cloud_range"][:3], np.float32)
            hi = np.asarray(self.reader["point_cloud_range"][3:], np.float32)
            gs = np.asarray(self.reader["grid_size"], np.float32)
            ph.setdefault("voxel_size", tuple(((hi - lo) / gs).tolist()))
            ph.setdefault("point_cloud_range",
                          tuple(lo.tolist()) + tuple(hi.tolist()))
        return builder.build_point_head(ph)

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
            if "sparse_features" in out:  # _v2p: voxel features -> point head
                st = out["sparse_features"]
                # re-key the structure in reversed (z, phi, r) coord order so
                # the batchloss head's grid devoxelization (which assumes
                # zyx-ordered coords) works on the cylindrical grid
                rev = sp.build_structure(
                    st.coords[..., ::-1], st.structure.num_voxels,
                    st.spatial_shape[::-1],
                )
                batch["conv_point_features"] = st.features
                batch["conv_structure"] = rev
                batch["conv_table"] = sp.dense_table(rev)
                # queries in cylindrical metric space (rho, phi, z)
                cyl = dv.cart2cylind(example["points"][..., :3])
                batch["points"] = cyl
                if "voxel_sem_labels" in r:
                    batch["voxel_sem_labels"] = r["voxel_sem_labels"]
                    batch["voxel_valid"] = st.structure.valid_mask()
            else:
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
