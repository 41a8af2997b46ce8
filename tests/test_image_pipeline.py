"""Image data pipeline: synthetic KITTI fixture with images + calib ->
full multimodal pipeline -> padded batch with consistent points_cuv."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lidarseg3d_tpu.datasets import build_dataset
from lidarseg3d_tpu.datasets.batching import collate_segnet, pad_batch_rows
from lidarseg3d_tpu.datasets.semantickitti import metadata as meta

PCR = [-6.0, -6.0, -2.0, 6.0, 6.0, 2.0]
VSZ = [0.3, 0.3, 0.4]
IMW, IMH = 1224, 370  # original KITTI cam2 size used by the projection
RESIZED = (128, 64)  # (W, H)


def write_fixture(root, frames=2, n=1200, seed=0):
    rng = np.random.default_rng(seed)
    seq = os.path.join(root, "00")
    os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(seq, "labels"), exist_ok=True)
    os.makedirs(os.path.join(seq, "image_2"), exist_ok=True)
    # simple calib: identity Tr, P2 with focal 500 centered
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        P = f"500 0 {IMW/2} 0 0 500 {IMH/2} 0 0 0 1 0"
        f.write(f"P0: {P}\nP1: {P}\nP2: {P}\nP3: {P}\n")
        f.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")  # lidar->cam axes swap
    raw_ids = list(meta.LEARNING_MAP.keys())
    for i in range(frames):
        pts = np.stack([
            rng.uniform(0.5, 6, n),  # in front (x>0)
            rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
            rng.uniform(0, 1, n),
        ], 1).astype(np.float32)
        pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        sem = rng.choice(raw_ids, size=n).astype(np.uint32)
        (sem | (np.uint32(1) << 16)).tofile(
            os.path.join(seq, "labels", f"{i:06d}.label"))
        img = rng.integers(0, 255, (IMH, IMW, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(seq, "image_2", f"{i:06d}.png"), img)


def make_ds(root, train=True):
    prep = (
        dict(mode="train", shuffle_points=True, npoints=1000,
             global_rot_noise=[-0.5, 0.5], global_scale_noise=[0.95, 1.05],
             global_translate_std=0.2)
        if train
        else dict(mode="val", shuffle_points=False)
    )
    img_prep = dict(
        shuffle_points=prep["shuffle_points"],
        random_horizon_flip=train,
        random_color_jitter_cfg=(
            dict(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.1)
            if train else None),
        random_jpeg_compression_cfg=(
            dict(quality_noise=[30, 70], probability=0.5) if train else None),
    )
    vg = dict(range=PCR, voxel_size=VSZ, max_points_in_voxel=5,
              max_voxel_num=[1500, 1500])
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset="SemanticKITTIDataset",
             use_img=True),
        dict(type="LoadImageFromFile", use_img=True),
    ]
    if train:
        pipeline += [
            dict(type="LoadPointCloudAnnotations", with_bbox=False),
            dict(type="LoadImageAnnotations", points_cp_radius=1),
        ]
    pipeline += [
        dict(type="SegPreprocess", cfg=prep),
        dict(type="SegImagePreprocess", cfg=img_prep),
        dict(type="SegVoxelization", cfg=vg),
    ]
    if train:
        pipeline.append(
            dict(type="SegAssignLabel", cfg=dict(voxel_label_enc="compact_value"))
        )
    pipeline.append(dict(type="Reformat"))
    return build_dataset(dict(
        type="SemanticKITTIDataset", root_path=root, sequences=["00"],
        pipeline=pipeline, test_mode=not train, use_img=True,
        cam_names=["1"],
        cam_attributes={"1": dict(mean=[0.406, 0.456, 0.485],
                                  std=[0.225, 0.224, 0.229])},
        img_resized_shape=RESIZED,
    ))


def test_multimodal_pipeline_train(tmp_path):
    root = str(tmp_path / "seqs")
    write_fixture(root)
    ds = make_ds(root, train=True)
    fr = ds.get_sensor_data(0, rng=np.random.default_rng(0))
    assert fr["images"].shape == (1, RESIZED[1], RESIZED[0], 3)
    assert fr["points_cuv"].shape == (fr["points"].shape[0], 4)
    cuv = fr["points_cuv"]
    valid = cuv[:, 0] > 0.5
    assert valid.sum() > 0
    # normalized coords ~within [-1, 1] for valid points (edge pixels can
    # exceed by W/(W-1) due to the resize-then-normalize convention, matching
    # the reference; the bilinear sampler clips)
    assert (np.abs(cuv[valid, 1:]) <= 1.05).all()
    assert fr["images_sem_labels"].shape == (1, RESIZED[1], RESIZED[0])
    assert fr["images_sem_labels"].max() > 0  # some painted pixels

    batch = collate_segnet([fr, fr], max_voxels=1500, max_points=1000)
    assert batch["images"].shape == (2, 1, RESIZED[1], RESIZED[0], 3)
    assert batch["images_sem_labels"].shape == (2, RESIZED[1], RESIZED[0])
    padded = pad_batch_rows(batch, 4)
    assert padded["images"].shape[0] == 4
    assert padded["images_sem_labels"].shape[0] == 4


def test_multimodal_pipeline_val(tmp_path):
    root = str(tmp_path / "seqs")
    write_fixture(root)
    ds = make_ds(root, train=False)
    fr = ds.get_sensor_data(0)
    assert "images_sem_labels" not in fr
    assert fr["points_cuv"].shape[0] == fr["points"].shape[0]


def test_projection_geometry(tmp_path):
    """A point straight ahead projects to the image center."""
    from lidarseg3d_tpu.datasets.pipelines.loading import (
        LoadPointCloudFromFile,
    )
    root = str(tmp_path / "seqs")
    write_fixture(root)
    stage = LoadPointCloudFromFile(dataset="SemanticKITTIDataset", use_img=True)
    pts = np.array([[5.0, 0.0, 0.0, 0.5]], np.float32)
    cp = stage._kitti_points_cp(
        pts, os.path.join(root, "00", "velodyne", "000000.bin")
    )
    assert cp[0, 0] == 1
    np.testing.assert_allclose(cp[0, 1], IMW / 2, atol=1.0)
    np.testing.assert_allclose(cp[0, 2], IMH / 2, atol=1.0)


def test_sc_conv_head_variant():
    """FCNMSeg3DHead(use_sc_conv=True) runs the SCBottleneck path
    (reference img_heads/sc_conv.py): finite outputs, same shapes as the
    plain-conv head."""
    import jax
    import jax.numpy as jnp
    from lidarseg3d_tpu.models.img_heads.fcn_mseg3d_head import FCNMSeg3DHead

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.normal(size=(2, 16, 24, c)).astype(np.float32))
        for c in (18, 36, 72, 144)
    ]
    inputs = [inputs[0],
              jnp.asarray(rng.normal(size=(2, 8, 12, 36)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(2, 4, 6, 72)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(2, 2, 3, 144)).astype(np.float32))]
    head = FCNMSeg3DHead(num_classes=5, num_convs=3, channels=32,
                         concat_input=False, use_sc_conv=True)
    variables = head.init(jax.random.PRNGKey(0), inputs, batch_size=2,
                          train=False)
    out = head.apply(variables, inputs, batch_size=2, train=False)
    assert out["image_logits"].shape == (2, 16, 24, 5)
    assert out["image_features"].shape == (2, 16, 24, 32)
    assert np.isfinite(np.asarray(out["image_logits"])).all()
    # the SCBottleneck params actually exist in the tree
    names = str(jax.tree_util.tree_structure(variables))
    assert "SCBottleneck" in names
