"""Segmentation preprocessing pipeline stages.

Mirrors det3d/datasets/pipelines/segpreprocess.py: train-time point
augmentations + shuffle + cap (SegPreprocess :21-123), host hard
voxelization (SegVoxelization :128-261), voxel label encoding
(SegAssignLabel :331-397), TTA variants (segtest_aug.py:39-89), and final
frame assembly (Reformat, formating.py:14-102).
"""

import numpy as np

from ...core import augment as aug
from ...core.voxelize import (
    VoxelGenerator,
    encode_compact_value_labels,
    encode_major_value_labels,
)
from ..registry import PIPELINES


@PIPELINES.register_module
class SegPreprocess:
    def __init__(self, cfg=None, **kwargs):
        self.mode = cfg["mode"]
        self.shuffle_points = cfg["shuffle_points"]
        self.npoints = cfg.get("npoints", -1)
        self.no_augmentation = cfg.get("no_augmentation", False)
        if self.mode == "train":
            self.global_rotation_noise = cfg["global_rot_noise"]
            self.global_scaling_noise = cfg["global_scale_noise"]
            self.global_translate_std = cfg.get("global_translate_std", 0)

    def __call__(self, sample, info):
        sample["mode"] = self.mode
        rng = sample.get("rng") or np.random.default_rng()
        points = sample["points"]

        if self.mode == "train":
            anno = sample["annotations"]
            sem = anno["point_sem_labels"]
            inst = anno["point_inst_labels"]

        if self.mode == "train" and not self.no_augmentation:
            points = aug.points_random_flip(points, rng=rng)
            points = aug.points_global_rotation(
                points, rotation=self.global_rotation_noise, rng=rng
            )
            points = aug.points_global_scaling(
                points, *self.global_scaling_noise, rng=rng
            )
            points = aug.points_global_translate(
                points, self.global_translate_std, rng=rng
            )

        if self.shuffle_points:
            idx = rng.permutation(points.shape[0])
            points = points[idx]
            if self.mode == "train":
                sem, inst = sem[idx], inst[idx]
        else:
            idx = np.arange(points.shape[0])
        if self.mode == "train":
            # +1 shift marks padding slots during voxel label voting
            sample["points_with_labels"] = np.concatenate(
                [points, sem[:, None].astype(np.float32) + 1.0], axis=-1
            )
            sample["annotations"] = {
                "point_sem_labels": sem, "point_inst_labels": inst,
            }

        sample["all_points"] = points
        if self.npoints > 0 and points.shape[0] > self.npoints:
            points = points[: self.npoints]
            idx = idx[: self.npoints]
            if self.mode == "train":
                sample["points_with_labels"] = sample["points_with_labels"][
                    : self.npoints
                ]
                sample["annotations"] = {
                    "point_sem_labels": sem[: self.npoints],
                    "point_inst_labels": inst[: self.npoints],
                }
        sample["points"] = points
        sample["points_shuffle_idx"] = idx
        return sample, info


@PIPELINES.register_module
class SegVoxelization:
    def __init__(self, cfg=None, **kwargs):
        self.range = cfg["range"]
        self.voxel_size = cfg["voxel_size"]
        self.max_points_in_voxel = cfg["max_points_in_voxel"]
        mv = cfg["max_voxel_num"]
        self.max_voxel_num = [mv, mv] if isinstance(mv, int) else mv
        self.tta_flag = cfg.get("tta_flag", False)
        self.num_tta_transforms = cfg.get(
            "num_tta_tranforms", cfg.get("num_tta_transforms", -1)
        )
        self.voxel_generator = VoxelGenerator(
            voxel_size=self.voxel_size,
            point_cloud_range=self.range,
            max_num_points=self.max_points_in_voxel,
            max_voxels=self.max_voxel_num[0],
            sort_by_key=cfg.get("sort_by_key", True),
        )

    def __call__(self, sample, info):
        max_voxels = self.max_voxel_num[0 if sample["mode"] == "train" else 1]
        src = (
            sample["points_with_labels"]
            if sample["mode"] == "train"
            else sample["points"]
        )
        voxels, coordinates, num_points = self.voxel_generator.generate(
            src, max_voxels=max_voxels
        )
        sample["voxels"] = dict(
            voxels=voxels,
            coordinates=coordinates,
            num_points=num_points,
            num_voxels=np.array([voxels.shape[0]], dtype=np.int64),
            shape=self.voxel_generator.grid_size,
            range=np.asarray(self.range, np.float32),
            size=np.asarray(self.voxel_size, np.float32),
        )

        # TTA variants: configured on this stage (tta_flag) or requested by
        # an upstream stage on the sample (e.g. the detection DoubleFlip)
        ntta = sample.get(
            "num_tta_transforms",
            self.num_tta_transforms if self.tta_flag else 0)
        if ntta > 1:
            for i in range(1, ntta):
                v, c, n = self.voxel_generator.generate(
                    sample[f"tta_{i}_points"], max_voxels=max_voxels
                )
                sample[f"tta_{i}_voxels"] = dict(
                    voxels=v, coordinates=c, num_points=n,
                    num_voxels=np.array([v.shape[0]], dtype=np.int64),
                    shape=self.voxel_generator.grid_size,
                )
        return sample, info


@PIPELINES.register_module
class SegAssignLabel:
    def __init__(self, cfg=None, **kwargs):
        self.voxel_label_enc = cfg["voxel_label_enc"]

    def __call__(self, sample, info):
        if sample["mode"] != "train":
            return sample, info
        dim_feat = info["dim"]["points"]
        vox = sample["voxels"]["voxels"]
        feats = vox[..., :dim_feat]
        labels = vox[..., dim_feat].astype(np.int64)
        sample["voxels"]["voxels"] = feats
        if self.voxel_label_enc == "compact_value":
            enc = encode_compact_value_labels(labels)
        elif self.voxel_label_enc == "major_value":
            enc = encode_major_value_labels(labels)
        else:
            raise NotImplementedError(self.voxel_label_enc)
        sample["targets"] = {
            "voxel_sem_labels": enc.astype(np.int32),
            "point_sem_labels": sample["annotations"]["point_sem_labels"],
        }
        return sample, info


@PIPELINES.register_module
class SegCompoundAug:
    """TTA input variants: N-1 random flip/rot/scale/translate copies
    (segtest_aug.py:39-89)."""

    def __init__(self, cfg=None, **kwargs):
        self.num_tta_transforms = cfg.get(
            "num_tta_tranforms", cfg.get("num_tta_transforms", 4)
        )
        self.rot = cfg.get("global_rot_noise", [-0.78539816, 0.78539816])
        self.scale = cfg.get("global_scale_noise", [0.95, 1.05])
        self.translate = cfg.get("global_translate_std", 0.5)

    def __call__(self, sample, info):
        rng = sample.get("rng") or np.random.default_rng()
        pts = sample["points"]
        for i in range(1, self.num_tta_transforms):
            p = pts.copy()
            p = aug.points_random_flip(p, rng=rng)
            p = aug.points_global_rotation(p, rotation=self.rot, rng=rng)
            p = aug.points_global_scaling(p, *self.scale, rng=rng)
            p = aug.points_global_translate(p, self.translate, rng=rng)
            sample[f"tta_{i}_points"] = p
        sample["num_tta_transforms"] = self.num_tta_transforms
        return sample, info


@PIPELINES.register_module
class Reformat:
    """Assemble the per-frame dict consumed by the collate
    (formating.py:14-102)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, sample, info):
        frame = {
            "points": sample["points"].astype(np.float32),
            "metadata": sample.get("metadata", {"token": info.get("token")}),
        }
        if "voxels" in sample:
            vox = sample["voxels"]
            frame["voxels"] = vox["voxels"].astype(np.float32)
            frame["coordinates"] = vox["coordinates"]
            frame["num_points_per_voxel"] = vox["num_points"]
        if sample["mode"] == "train" and "targets" in sample:
            frame["voxel_sem_labels"] = sample["targets"]["voxel_sem_labels"]
            frame["point_sem_labels"] = sample["targets"]["point_sem_labels"]
        elif sample["mode"] == "train" and "annotations" in sample:
            # dynamic-VFE path: no host voxelization, point labels only
            frame["point_sem_labels"] = sample["annotations"]["point_sem_labels"]
        if "points_cuv" in sample:
            frame["points_cuv"] = sample["points_cuv"].astype(np.float32)
            frame["images"] = sample["images"].astype(np.float32)
            if "images_sem_labels" in sample:
                frame["images_sem_labels"] = sample["images_sem_labels"]
        if sample.get("num_tta_transforms", 0) > 0:
            variants = [frame]
            for i in range(1, sample["num_tta_transforms"]):
                v = sample[f"tta_{i}_voxels"]
                var = {
                    "points": sample[f"tta_{i}_points"].astype(np.float32),
                    "voxels": v["voxels"].astype(np.float32),
                    "coordinates": v["coordinates"],
                    "num_points_per_voxel": v["num_points"],
                    "metadata": frame["metadata"],
                }
                # point->pixel correspondences are computed from the ORIGINAL
                # cloud; lidar-space TTA transforms don't move the cameras, so
                # every variant keeps the same images + points_cuv rows (val
                # mode never shuffles, so row alignment holds)
                for k in ("points_cuv", "images", "images_sem_labels"):
                    if k in frame:
                        var[k] = frame[k]
                variants.append(var)
            return variants, info
        return frame, info


@PIPELINES.register_module
class SegImagePreprocess:
    """Multi-camera image preprocessing co-transforming points_cp + pixel
    labels (segpreprocess.py:402-676): resize to a common shape, train augs
    (h-flip, color jitter, jpeg compression, rescale, crop), per-camera
    normalization, and the final points_cuv = [valid, norm_cam, norm_v,
    norm_u] in [-1, 1] for point-to-pixel sampling."""

    def __init__(self, cfg=None, **kwargs):
        from . import img_transforms as T

        self.T = T
        cfg = cfg or {}
        self.shuffle_points = cfg.get("shuffle_points", False)
        self.random_horizon_flip = cfg.get("random_horizon_flip", False)
        self.color_jitter_cfg = cfg.get("random_color_jitter_cfg", None)
        self.jpeg_cfg = cfg.get("random_jpeg_compression_cfg", None)
        self.rescale_cfg = cfg.get("random_rescale_cfg", None)
        self.crop_cfg = cfg.get("random_crop_cfg", None)
        self.no_augmentation = cfg.get("no_augmentation", False)

    def __call__(self, sample, info):
        T = self.T
        mode = sample["mode"]
        rng = sample.get("rng") or np.random.default_rng()
        cam_names = info["cam"]["names"]
        cam_attributes = info["cam"]["attributes"]
        resized_shape = info["cam"]["resized_shape"]  # (W, H)
        points_cp = sample["points_cp"].copy()
        images = sample["images"]
        labels = sample.get("image_sem_labels")

        out_images, out_labels = [], []
        for ci, (cam_id, img) in enumerate(zip(cam_names, images)):
            sel = points_cp[:, 0] == int(cam_id)
            lab = labels[ci] if labels is not None else None
            img, cp, lab = T.resize_image_points_label(
                img, points_cp[sel], lab, resized_shape
            )
            if mode == "train" and not self.no_augmentation:
                if self.random_horizon_flip:
                    img, cp[:, 1], lab = T.random_horizontal_flip(
                        img, cp[:, 1], lab, rng
                    )
                if self.color_jitter_cfg is not None:
                    img = T.color_jitter(img, rng, **self.color_jitter_cfg)
                if self.jpeg_cfg is not None:
                    img = T.jpeg_compression(img, rng, **self.jpeg_cfg)
                if self.rescale_cfg is not None:
                    img, cp, lab = T.random_rescale(
                        img, cp, lab, rng, **self.rescale_cfg
                    )
                if self.crop_cfg is not None:
                    img, cp, lab = T.random_crop(
                        img, cp, lab, rng, **self.crop_cfg
                    )
            points_cp[sel] = cp
            out_images.append(img)  # normalized below, straight into the
            # preallocated camera block (no per-camera fp32 temporaries, no
            # np.stack copy — both measured to dominate this stage's time)
            if lab is not None:
                out_labels.append(lab)

        # after train augs every camera must share one shape
        shapes = {im.shape[:2] for im in out_images}
        assert len(shapes) == 1, f"inconsistent camera shapes: {shapes}"
        H, W = out_images[0].shape[:2]
        images_out = np.empty((len(out_images), H, W, 3), np.float32)
        for ci, (cam_id, img) in enumerate(zip(cam_names, out_images)):
            attr = cam_attributes[cam_id]
            T.normalize_image_into(img, attr["mean"], attr["std"],
                                   images_out[ci])

        if self.shuffle_points or sample.get("points_shuffle_idx") is not None:
            idx = sample.get("points_shuffle_idx")
            if idx is not None:
                points_cp = points_cp[idx]

        n = points_cp.shape[0]
        cuv = np.full((n, 4), -100.0, np.float32)
        cuv[:, 0] = (points_cp[:, 0] > 0).astype(np.float32)
        if len(cam_names) > 1:
            cuv[:, 1] = (points_cp[:, 0] - 1) / (len(cam_names) - 1) * 2 - 1
        else:
            cuv[:, 1] = 0.0
        cuv[:, 2] = points_cp[:, 2] / (H - 1) * 2 - 1  # v (height)
        cuv[:, 3] = points_cp[:, 1] / (W - 1) * 2 - 1  # u (width)

        sample["points_cp"] = points_cp
        sample["points_cuv"] = cuv
        sample["images"] = images_out  # [ncam, H, W, 3] fp32
        if out_labels:
            sample["images_sem_labels"] = np.stack(out_labels, axis=0).astype(
                np.int32
            )
        return sample, info
