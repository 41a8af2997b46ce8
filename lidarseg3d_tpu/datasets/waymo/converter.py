"""Waymo tfrecord -> pkl conversion (3D semantic segmentation frames).

Replaces det3d/datasets/waymo/waymo_converter.py + semanticwaymo_decoder.py.
Requires tensorflow + waymo_open_dataset AT CONVERSION TIME ONLY (neither is
needed for training/eval, which consume the pkl frames). This image ships
without them, so every entry point raises a clear error if they're absent.

Decoding uses the official frame_utils helpers (range image -> point cloud,
range image -> per-point segmentation labels) rather than hand-rolled
spherical math; per-point camera projections come from the
camera_projection range images. Labels cover the TOP lidar (ri1 + ri2) and
are zero-padded to the all-lidar point count, matching the reference
(det3d/datasets/pipelines/loading.py:478-495).
"""

import os
import os.path as osp
import pickle


def _require_waymo():
    try:
        import tensorflow as tf  # noqa: F401
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "Waymo conversion requires `tensorflow` and `waymo_open_dataset` "
            "(pip install waymo-open-dataset-tf-2-11-0). These are only "
            "needed to convert tfrecords; training/eval use the pkl output."
        ) from e


def _top_range_image_indexing(range_images, ri_index):
    """(col, row) indices of the TOP lidar's valid range-image cells, in the
    order convert_range_image_to_point_cloud emits points (numpy port of
    the reference get_range_image_point_indexing,
    semanticwaymo_common.py:158-182). Needed to scatter per-point prediction
    labels back into [64, 2650] range images for the eval server."""
    import numpy as np
    from waymo_open_dataset import dataset_pb2

    ri = range_images[dataset_pb2.LaserName.TOP][ri_index]
    arr = np.array(ri.data, np.float32).reshape(ri.shape.dims)
    rows, cols = np.where(arr[..., 0] > 0)
    return np.stack([cols, rows], axis=-1).astype(np.int32)


def decode_frame(frame):
    """One Frame proto -> our pkl frame dict (see dataset.py docstring).

    Point order: for each return index (ri1 then ri2), lidars in
    frame.lasers order with TOP first — the seg-label order the eval
    truncation relies on. top_slices + top_ri_indexing let the submission
    writer rebuild the official label range images without re-reading
    tfrecords.
    """
    import numpy as np
    from waymo_open_dataset.utils import frame_utils

    (range_images, camera_projections, seg_labels, range_image_top_pose
     ) = frame_utils.parse_range_image_and_camera_projection(frame)

    points_all, cp_all, labels_all = [], [], []
    num_seg_points = 0
    top_counts = []  # TOP-lidar point count per return
    ri_starts = []  # offset of each return's first point in the flat order
    for ri_index in (0, 1):
        ri_starts.append(sum(len(p) for p in points_all))
        points, cps = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose,
            ri_index=ri_index, keep_polar_features=True,
        )
        top_counts.append(len(points[0]))  # lasers order puts TOP first
        if seg_labels:
            point_labels = frame_utils.convert_range_image_to_point_cloud_labels(
                frame, range_images, seg_labels, ri_index=ri_index
            )
        else:
            point_labels = [np.zeros((len(p), 2), np.int32) for p in points]
        for p, cp, pl in zip(points, cps, point_labels):
            # p: [N, 6] (range, intensity, elongation, x, y, z)
            xyz = p[:, 3:6].astype(np.float32)
            feat = p[:, 1:3].astype(np.float32)
            points_all.append(np.concatenate([xyz, feat], axis=1))
            # cp: [N, 6] (cam1 id, x, y, cam2 id, x, y) -> first projection
            cp_arr = np.asarray(cp, np.float32)
            cp3 = cp_arr[:, :3].copy()
            cp3[cp3[:, 0] <= 0] = -100.0
            cp_all.append(cp3)
            # pl: [N, 2] (instance, semantic); semantic in col 1
            pl = np.asarray(pl)
            if pl.size:
                labels_all.append(pl[:, 1].astype(np.uint8))
                num_seg_points += len(pl)
            else:
                labels_all.append(np.zeros(len(p), np.uint8))

    points = np.concatenate(points_all, axis=0)
    cp = np.concatenate(cp_all, axis=0)
    labels = np.concatenate(labels_all, axis=0)
    return {
        # vehicle->global pose + time, for the tracking tools
        # (tools/waymo_tracking.py transforms boxes into the global frame)
        "veh_to_global": np.asarray(
            frame.pose.transform, np.float64).reshape(4, 4),
        "timestamp": frame.timestamp_micros / 1e6,
        "lidars": {
            "points_xyz": points[:, :3],
            "points_feature": points[:, 3:5],
            "points_cp": cp,
            "num_points_of_top_lidar": {
                "ri_return1": int(top_counts[0]),
                "ri_return2": int(top_counts[1]),
            },
            # flat-point slices of the TOP lidar per return: [start, count]
            "top_slices": {
                "ri1": [int(ri_starts[0]), int(top_counts[0])],
                "ri2": [int(ri_starts[1]), int(top_counts[1])],
            },
            # (col, row) range-image cells of those points, same order
            "top_ri_indexing": {
                "ri1": _top_range_image_indexing(range_images, 0),
                "ri2": _top_range_image_indexing(range_images, 1),
            },
        },
        "annotations": {
            "point_sem_labels": labels,
            "num_seg_points": int(num_seg_points),
            **_decode_laser_labels(frame),
        },
    }


_WAYMO_TYPE_NAMES = {1: "VEHICLE", 2: "PEDESTRIAN", 3: "SIGN", 4: "CYCLIST"}


def _decode_laser_labels(frame):
    """frame.laser_labels -> gt boxes for the detection pipeline
    (cf. det3d/datasets/waymo/waymo_decoder.py): [x, y, z, dx(L), dy(W),
    dz(H), heading] + class names + lidar point counts."""
    import numpy as np

    boxes, names, counts = [], [], []
    for lab in frame.laser_labels:
        b = lab.box
        boxes.append([b.center_x, b.center_y, b.center_z,
                      b.length, b.width, b.height, b.heading])
        names.append(_WAYMO_TYPE_NAMES.get(int(lab.type), "UNKNOWN"))
        counts.append(int(lab.num_lidar_points_in_box))
    return {
        "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 7),
        "gt_names": np.asarray(names, dtype=object),
        "gt_num_points": np.asarray(counts, np.int32),
    }


def export_frame_images(frame, token, image_dir):
    """Write each camera's JPEG (already encoded in the proto) to disk and
    return cam_paths {cam_id(str): path} + image sizes. Reference decodes
    and re-encodes (semanticwaymo_decoder.py:45-231); the proto bytes are
    the same JPEGs, so we write them directly."""
    os.makedirs(image_dir, exist_ok=True)
    cam_paths, cam_sizes = {}, {}
    for img in frame.images:
        cam_id = str(int(img.name))  # 1..5 (FRONT..SIDE_RIGHT)
        path = osp.join(image_dir, f"{token}_cam{cam_id}.jpg")
        with open(path, "wb") as f:
            f.write(img.image)
        cam_paths[cam_id] = path
    for calib in frame.context.camera_calibrations:
        cam_sizes[str(int(calib.name))] = (int(calib.width),
                                           int(calib.height))
    return cam_paths, cam_sizes


def create_semanticwaymo_infos(root, out_dir=None, nsweeps=1, split="training",
                               seg_only=True, export_images=True):
    """Convert <root>/<split>/*.tfrecord into per-frame pkls + an info pkl.

    export_images writes each camera JPEG next to the frames so the MSeg3D
    multimodal configs (cam_names 1..5) can train."""
    _require_waymo()
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2

    out_dir = out_dir or root
    frame_dir = osp.join(out_dir, f"{split}_frames")
    image_dir = osp.join(out_dir, f"{split}_images")
    os.makedirs(frame_dir, exist_ok=True)
    infos = []
    # rolling per-context history for multi-sweep infos
    prev_frames = []
    records = sorted(
        f for f in os.listdir(osp.join(root, split)) if "tfrecord" in f
    )
    for rec in records:
        ds = tf.data.TFRecordDataset(osp.join(root, split, rec),
                                     compression_type="")
        for data in ds:
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            has_seg = bool(
                frame.lasers[0].ri_return1.segmentation_label_compressed
            )
            if seg_only and split == "training" and not has_seg:
                continue  # only annotated frames carry seg labels
            obj = decode_frame(frame)
            token = f"{frame.context.name}_{frame.timestamp_micros}"
            if export_images:
                cam_paths, cam_sizes = export_frame_images(
                    frame, token, image_dir)
                obj["cam_paths"] = cam_paths
                obj["cam_sizes"] = cam_sizes
            else:
                obj["cam_paths"] = {}
            path = osp.join(frame_dir, f"{token}.pkl")
            obj["token"] = token
            with open(path, "wb") as f:
                pickle.dump(obj, f)
            ts = frame.timestamp_micros / 1e6
            pose = obj["veh_to_global"]
            # previous same-context frames as sweeps (newest first), with
            # the transform into THIS frame's vehicle coordinates
            ref_inv = None
            sweeps = []
            for p in reversed(prev_frames[-(max(nsweeps - 1, 0)):]):
                if p["context"] != frame.context.name:
                    break
                if ref_inv is None:
                    import numpy as _np
                    ref_inv = _np.linalg.inv(pose)
                sweeps.append({
                    "path": p["path"],
                    "sweep_to_ref": (ref_inv @ p["pose"]).astype("float32"),
                    "time_lag": float(ts - p["timestamp"]),
                })
            infos.append({"token": token, "path": path,
                          "context": frame.context.name,
                          "timestamp": ts, "sweeps": sweeps})
            prev_frames.append({"context": frame.context.name, "path": path,
                                "pose": pose, "timestamp": ts})
            if len(prev_frames) > 8:
                prev_frames.pop(0)
    info_path = osp.join(
        out_dir, f"infos_{split}_{nsweeps:02d}sweeps_segdet.pkl"
    )
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return info_path
