"""Point cloud / annotation loading stages.

Mirrors det3d/datasets/pipelines/loading.py for the segmentation datasets:
KITTI .bin scans ([x,y,z,intensity] float32), labels = uint32 with
semantics in the low 16 bits, learning-map remap.
"""

import numpy as np

from ..registry import PIPELINES


def read_calib_semantickitti(calib_path):
    """Parse a SemanticKITTI calib.txt -> dict of P0..P3 [3,4] and Tr [4,4]."""
    out = {}
    with open(calib_path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            arr = np.array([float(x) for x in vals.split()], np.float32)
            out[key.strip()] = arr.reshape(3, 4)
    tr = np.eye(4, dtype=np.float32)
    tr[:3, :4] = out["Tr"]
    out["Tr"] = tr
    return out


def select_points_in_frustum(pts_2d, x1, y1, x2, y2):
    return (
        (pts_2d[:, 0] >= x1) & (pts_2d[:, 0] < x2)
        & (pts_2d[:, 1] >= y1) & (pts_2d[:, 1] < y2)
    )


@PIPELINES.register_module
class LoadPointCloudFromFile:
    def __init__(self, dataset="SemanticKITTIDataset", use_img=False, **kwargs):
        self.type = dataset
        self.use_img = use_img

    def _kitti_points_cp(self, points, path):
        """Per-point [cam_id, w, h] camera projection via P2 @ Tr
        (loading.py:302-334); cam_id 1-based, invalid rows = -100."""
        calib_path = path[: -len("velodyne/000000.bin")] + "calib.txt"
        calib = read_calib_semantickitti(calib_path)
        proj = calib["P2"] @ calib["Tr"]  # [3, 4]
        hpts = np.concatenate(
            [points[:, :3], np.ones((len(points), 1), np.float32)], axis=1
        )
        img_pts = (proj @ hpts.T).T
        img_pts = img_pts[:, :2] / np.maximum(img_pts[:, 2:3], 1e-6)
        im_width, im_height = 1224, 370
        mask = select_points_in_frustum(img_pts, 0, 0, im_width, im_height)
        mask &= points[:, 0] > 0  # points in front of the car
        cp = np.full((len(points), 3), -100.0, np.float32)
        cp[mask, 0] = 1
        cp[mask, 1:3] = img_pts[mask]
        return cp

    def __call__(self, sample, info):
        sample["type"] = self.type
        if self.type == "SemanticKITTIDataset":
            points = np.fromfile(info["path"], dtype=np.float32).reshape(-1, 4)
            sample["points"] = points
            if self.use_img:
                sample["points_cp"] = self._kitti_points_cp(points, info["path"])
        elif self.type == "SemanticNuscDataset":
            # [x, y, z, intensity, ring] float32 rows of 5 (loading.py:358-368)
            points = np.fromfile(
                info["lidar_path"], dtype=np.float32
            ).reshape(-1, 5)
            nsweeps = sample.get("nsweeps", 1)
            if nsweeps > 1:
                pts_list = [np.concatenate(
                    [points, np.zeros((len(points), 1), np.float32)], axis=1
                )]
                for sw in info["sweeps"][: nsweeps - 1]:
                    p = np.fromfile(
                        sw["lidar_path"], dtype=np.float32
                    ).reshape(-1, 5)
                    hom = np.concatenate(
                        [p[:, :3], np.ones((len(p), 1), np.float32)], axis=1
                    )
                    p[:, :3] = (sw["sweep_to_ref"] @ hom.T).T[:, :3]
                    t = np.full((len(p), 1), sw["time_lag"], np.float32)
                    pts_list.append(np.concatenate([p, t], axis=1))
                points = np.concatenate(pts_list, axis=0)
            sample["points"] = points
            if self.use_img:
                sample["points_cp"] = self._nusc_points_cp(points, info)
        elif self.type == "SemanticWaymoDataset":
            import pickle

            with open(info["path"], "rb") as f:
                obj = pickle.load(f)
            sample["waymo_obj"] = obj
            lid = obj["lidars"]
            points = np.concatenate(
                [lid["points_xyz"], lid["points_feature"]], axis=1
            ).astype(np.float32)
            nsweeps = sample.get("nsweeps", 1)
            if nsweeps > 1 and info.get("sweeps"):
                # two-sweep detection input (reference
                # waymo_centerpoint_voxelnet_two_sweeps_*): earlier frames
                # transformed into this frame's vehicle coords, +time-lag
                # channel (0 for the key frame)
                pts_list = [np.concatenate(
                    [points, np.zeros((len(points), 1), np.float32)],
                    axis=1)]
                for sw in info["sweeps"][: nsweeps - 1]:
                    with open(sw["path"], "rb") as f:
                        sobj = pickle.load(f)
                    sl = sobj["lidars"]
                    p = np.concatenate(
                        [sl["points_xyz"], sl["points_feature"]], axis=1
                    ).astype(np.float32)
                    T = np.asarray(sw["sweep_to_ref"], np.float32)
                    p[:, :3] = p[:, :3] @ T[:3, :3].T + T[:3, 3]
                    t = np.full((len(p), 1), sw["time_lag"], np.float32)
                    pts_list.append(np.concatenate([p, t], axis=1))
                points = np.concatenate(pts_list, axis=0)
            sample["points"] = points
            if self.use_img:
                # waymo provides per-point camera projections directly
                # (loading.py:353-356); sweep points carry no projection
                # (invalid marker -100, same as out-of-view points)
                cp = lid["points_cp"].astype(np.float32)
                if len(cp) < len(points):
                    pad = np.full((len(points) - len(cp), cp.shape[1]),
                                  -100.0, np.float32)
                    cp = np.concatenate([cp, pad])
                sample["points_cp"] = cp
        else:
            raise NotImplementedError(self.type)
        return sample, info

    @staticmethod
    def _nusc_points_cp(points, info):
        """Per-point [cam_id, w, h] via lidar->global->cam->image chains
        (loading.py:372-416); cam_id 1-based in cam_chan order."""
        cam_chans = info["cam"]["chan"]
        im_h, im_w = 900, 1600
        cp = np.full((len(points), 3), -100.0, np.float32)
        hom = np.concatenate(
            [points[:, :3], np.ones((len(points), 1), np.float32)], axis=1
        )
        pts_global = info["ref_to_global"].astype(np.float64) @ hom.T  # 4xN
        for cam_id, chan in enumerate(cam_chans):
            pts_cam = (info["cams_from_global"][chan].astype(np.float64)
                       @ pts_global)[:3]
            K = np.asarray(info["cam_intrinsics"][chan], np.float64)
            uvw = K @ pts_cam
            uv = uvw[:2] / np.maximum(uvw[2:3], 1e-6)
            mask = (
                (pts_cam[2] > 0)
                & (uv[0] > 1) & (uv[0] < im_w - 1)
                & (uv[1] > 1) & (uv[1] < im_h - 1)
            )
            cp[mask, 0] = cam_id + 1
            cp[mask, 1] = uv[0][mask]
            cp[mask, 2] = uv[1][mask]
        return cp


@PIPELINES.register_module
class LoadPointCloudAnnotations:
    def __init__(self, with_bbox=False, **kwargs):
        self.with_bbox = with_bbox

    def __call__(self, sample, info):
        if sample["type"] == "SemanticKITTIDataset":
            label_path = (
                info["path"].replace("velodyne", "labels").replace(".bin", ".label")
            )
            raw = np.fromfile(label_path, dtype=np.uint32).reshape(-1)
            sem = (raw & 0xFFFF).astype(np.int64)
            inst = (raw >> 16).astype(np.int64)
            lut = info["remap_lut"]
            sample["annotations"] = {
                "point_sem_labels": lut[sem].astype(np.int32),
                "point_inst_labels": inst.astype(np.int32),
            }
        elif sample["type"] == "SemanticNuscDataset":
            raw = np.fromfile(info["lidarseg_path"], dtype=np.uint8).reshape(-1)
            lut = info["remap_lut"]
            sem = lut[raw.astype(np.int64)].astype(np.int32)
            n = len(sample["points"])
            if n > len(sem):  # multi-sweep: label only the key-frame points
                sem = np.concatenate(
                    [sem, np.zeros(n - len(sem), np.int32)]
                )
            sample["annotations"] = {
                "point_sem_labels": sem,
                "point_inst_labels": np.zeros(n, np.int32),
            }
        elif sample["type"] == "SemanticWaymoDataset":
            obj = sample["waymo_obj"]
            labels = np.asarray(
                obj["annotations"]["point_sem_labels"], np.int32
            )
            n = len(sample["points"])
            if n > len(labels):  # pad to all-lidar count (loading.py:478-495)
                labels = np.concatenate(
                    [labels, np.zeros(n - len(labels), np.int32)]
                )
            sample["annotations"] = {
                "point_sem_labels": labels[:n],
                "point_inst_labels": np.zeros(n, np.int32),
            }
        else:
            raise NotImplementedError(sample["type"])
        return sample, info


@PIPELINES.register_module
class LoadImageFromFile:
    """cv2 BGR reads of the per-frame camera set (loading.py:525-576)."""

    def __init__(self, use_img=True, **kwargs):
        self.use_img = use_img

    def __call__(self, sample, info):
        if not self.use_img:
            return sample, info
        import cv2

        if sample["type"] == "SemanticKITTIDataset":
            img_path = (
                info["path"].replace("velodyne", "image_2").replace(".bin", ".png")
            )
            cam_paths = {"1": img_path}
            cam_keys = info["cam"]["names"]
        else:
            cam_paths = info["cam_paths"]
            # nuScenes paths are keyed by channel name, Waymo by cam id
            cam_keys = info["cam"].get("chan") or info["cam"]["names"]
        sample["images"] = [cv2.imread(cam_paths[c]) for c in cam_keys]
        return sample, info


@PIPELINES.register_module
class LoadImageAnnotations:
    """Paint sparse pixel GT by splatting projected point labels
    (loading.py:580-641)."""

    def __init__(self, points_cp_radius=1, use_img=True, **kwargs):
        self.points_cp_radius = points_cp_radius
        self.use_img = use_img

    def __call__(self, sample, info):
        if not self.use_img:
            return sample, info
        import cv2

        cam_names = info["cam"]["names"]
        points_cp = sample["points_cp"]
        labels = sample["annotations"]["point_sem_labels"]
        sem_maps = []
        for cam_id, img in zip(cam_names, sample["images"]):
            H, W = img.shape[:2]
            m = np.zeros((H, W), dtype=np.uint8)
            sel = points_cp[:, 0] == int(cam_id)
            ws = points_cp[sel, 1]
            hs = points_cp[sel, 2]
            ls = labels[sel]
            for i in range(len(ws)):
                if ls[i] > 0:
                    cv2.circle(
                        m, (int(ws[i]), int(hs[i])), self.points_cp_radius,
                        int(ls[i]), -1,
                    )
            sem_maps.append(m)
        sample["image_sem_labels"] = sem_maps
        return sample, info
