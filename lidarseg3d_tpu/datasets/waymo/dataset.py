"""SemanticWaymo dataset (Waymo Open Dataset 3D semantic segmentation).

Mirrors /root/reference/det3d/datasets/waymo/semanticwaymo.py:23-263: frames
are pre-converted pkl objects (tools/create_data.py semanticwaymo, requires
tensorflow + waymo_open_dataset at conversion time only). Labels are the 23
Waymo seg classes (0 = undefined/ignore), already train ids — no remap.

Frame pkl layout (produced by our converter):
  {"token": str,
   "lidars": {"points_xyz": [N,3] f32, "points_feature": [N,2] f32,
               "points_cp": [N,3] f32  # [cam_id 1..5, w, h]; -100 = none
              },
   "annotations": {"point_sem_labels": [N] uint8}  # ri1+ri2 top lidar,
                                                   # padded w/ 0 to all-lidar
   "cam_paths": {cam_id(str): path},
  }
"""

import os.path as osp
import pickle

import numpy as np

from ...core.seg_metrics import fast_hist_crop, per_class_iou
from ..pipelines.compose import Compose
from ..registry import DATASETS

CLASS_NAMES = [
    "undefined", "car", "truck", "bus", "other_vehicle", "motorcyclist",
    "bicyclist", "pedestrian", "sign", "traffic_light", "pole",
    "construction_cone", "bicycle", "motorcycle", "building", "vegetation",
    "tree_trunk", "curb", "road", "lane_marker", "other_ground", "walkable",
    "sidewalk",
]


@DATASETS.register_module
class SemanticWaymoDataset:
    NumPointFeatures = 5  # x, y, z, intensity, elongation
    CLASSES = 23

    def __init__(
        self,
        info_path,
        root_path,
        nsweeps=1,
        load_interval=1,
        pipeline=None,
        test_mode=False,
        class_names=None,
        cam_names=None,
        cam_attributes=None,
        img_resized_shape=None,
        **kwargs,
    ):
        self._root_path = root_path
        self.nsweeps = nsweeps
        self.test_mode = test_mode
        self._use_img = cam_names is not None
        self._num_point_features = (
            self.NumPointFeatures if nsweeps == 1 else self.NumPointFeatures + 1
        )
        if self._use_img:
            self._cam_names = list(cam_names)
            self.img_resized_shape = tuple(img_resized_shape)
            self._cam_attributes = {
                k: {"mean": np.asarray(v["mean"], np.float32),
                    "std": np.asarray(v["std"], np.float32)}
                for k, v in (cam_attributes or {}).items()
            }
        with open(info_path, "rb") as f:
            self._infos = pickle.load(f)
        if load_interval > 1:
            self._infos = self._infos[::load_interval]
        self.num_classes = self.CLASSES
        self.flag = np.ones(len(self), dtype=np.uint8)
        self.pipeline = Compose(pipeline) if pipeline is not None else None

    def __len__(self):
        return len(self._infos)

    def load_infos(self, idx):
        info = dict(self._infos[idx])
        if not osp.isabs(info["path"]):
            info["path"] = osp.join(self._root_path, info["path"])
        info["dim"] = {"points": self._num_point_features, "sem_labels": 1,
                       "inst_labels": 1}
        if self._use_img:
            info["cam"] = {
                "names": self._cam_names,
                "attributes": self._cam_attributes,
                "resized_shape": self.img_resized_shape,
            }
        return info

    def get_sensor_data(self, idx, rng=None):
        info = self.load_infos(idx)
        sample = {
            "mode": "val" if self.test_mode else "train",
            "metadata": {"token": info["token"], "path": info["path"],
                         "num_point_features": self._num_point_features},
            "nsweeps": self.nsweeps,
            "rng": rng,
        }
        data, _ = self.pipeline(sample, info)
        return data

    def __getitem__(self, idx):
        return self.get_sensor_data(idx)

    def get_anno_for_eval(self, token):
        info = next(i for i in self._infos if i["token"] == token)
        path = info["path"]
        if not osp.isabs(path):
            path = osp.join(self._root_path, path)
        with open(path, "rb") as f:
            obj = pickle.load(f)
        labels = obj["annotations"]["point_sem_labels"]
        n_seg = obj["annotations"].get("num_seg_points", len(labels))
        return {"point_sem_labels": np.asarray(labels)[:n_seg].astype(np.uint8),
                "num_seg_points": n_seg}

    def evaluation(self, detections, output_dir=None, testset=False, **kwargs):
        if testset:
            # official submission requires the waymo proto writer
            # (semanticwaymo_common.py:269); gate on availability
            try:
                from .submission import write_segmentation_submission

                return write_segmentation_submission(
                    self, detections, output_dir
                ), None
            except ImportError as e:
                raise RuntimeError(
                    "Waymo submission requires waymo_open_dataset: " + str(e)
                )
        unique_label = np.arange(1, self.CLASSES) - 1
        hist = 0
        for token, pred in detections.items():
            anno = self.get_anno_for_eval(token)
            gt = anno["point_sem_labels"]
            pl = np.asarray(pred["pred_point_sem_labels"])[: len(gt)]
            hist = hist + fast_hist_crop(pl, gt, unique_label)
        # multi-host: sum per-host shard histograms (dist.allreduce_hist
        # is the identity in single-process runs)
        from ...parallel.dist import allreduce_hist
        hist = allreduce_hist(hist)
        ious = per_class_iou(hist)
        result = {"mIoU": float(np.nanmean(ious)) * 100}
        for c, ciou in zip(CLASS_NAMES[1:], ious):
            result[c] = ciou * 100
        return {"results": result, "detail": {}}, None
