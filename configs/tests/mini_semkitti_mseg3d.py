# Tiny MSeg3D smoke config over the synthetic mini-KITTI fixture.
num_class = 20
ignore_class = 0
point_cloud_range = [-6.0, -6.0, -2.0, 6.0, 6.0, 2.0]
voxel_size = [0.3, 0.3, 0.4]
ignore_label = 0

use_img = True
cam_names = ["1"]
cam_attributes = {"1": dict(mean=[0.406, 0.456, 0.485], std=[0.225, 0.224, 0.229])}
img_resized_shape = (128, 64)

tiny_hrnet = dict(
    type="HRNet", frozen_stages=-1,
    extra=dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(1,), num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(1, 1), num_channels=(4, 8)),
        stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                    num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
        stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                    num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
    ),
)
fcn_head = dict(
    type="FCNMSeg3DHead", num_classes=num_class, ignore_index=ignore_class,
    in_index=(0, 1, 2, 3), in_channels=(4, 8, 16, 32), num_convs=1,
    channels=12, concat_input=False, loss_weight=0.5,
)

model = dict(
    type="SegMSeg3DNet",
    img_backbone=tiny_hrnet, img_head=fcn_head,
    reader=dict(type="ImprovedMeanVoxelFeatureExtractor", num_input_features=4),
    backbone=dict(type="UNetSCN3D", num_input_features=12,
                  point_cloud_range=point_cloud_range, voxel_size=voxel_size,
                  model_cfg=dict(SCALING_RATIO=1)),
    point_head=dict(
        type="PointSegMSeg3DHead", class_agnostic=False, num_class=num_class,
        model_cfg=dict(
            VOXEL_IN_DIM=16, VOXEL_CLS_FC=[16], VOXEL_ALIGN_DIM=16,
            IMAGE_IN_DIM=12, IMAGE_ALIGN_DIM=16, GEO_FUSED_DIM=16,
            OUT_CLS_FC=[16], IGNORED_LABEL=0, DP_RATIO=0.25, MIMIC_FC=[16],
            SFPhase_CFG=dict(embeddings_proj_kernel_size=1, d_model=16,
                             n_head=4, n_layer=2, n_ffn=32, drop_ratio=0,
                             activation="relu", pre_norm=False),
        ),
    ),
)
train_cfg = dict()
test_cfg = dict()

dataset_type = "SemanticKITTIDataset"
data_root = "/tmp/minikitti_img/seqs"

train_preprocessor = dict(mode="train", shuffle_points=True, npoints=1000,
                          global_rot_noise=[-0.5, 0.5],
                          global_scale_noise=[0.95, 1.05],
                          global_translate_std=0.2)
val_preprocessor = dict(mode="val", shuffle_points=False)
train_img_preprocessor = dict(
    shuffle_points=True, random_horizon_flip=True,
    random_color_jitter_cfg=dict(brightness=0.3, contrast=0.3,
                                 saturation=0.3, hue=0.1),
    random_jpeg_compression_cfg=dict(quality_noise=[30, 70], probability=0.5),
)
val_img_preprocessor = dict(shuffle_points=False)
voxel_generator = dict(range=point_cloud_range, voxel_size=voxel_size,
                       max_points_in_voxel=5, max_voxel_num=[1500, 1500])
# capacities must cover the whole scan (production configs size these >=
# the dataset's max voxels/points; eval compares per-point predictions
# against the FULL label file, so dropped points would break evaluation)
capacity = dict(max_voxels=1536, max_points=1536)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type, use_img=use_img),
    dict(type="LoadImageFromFile", use_img=use_img),
    dict(type="LoadPointCloudAnnotations", with_bbox=False),
    dict(type="LoadImageAnnotations", points_cp_radius=1),
    dict(type="SegPreprocess", cfg=train_preprocessor),
    dict(type="SegImagePreprocess", cfg=train_img_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="SegAssignLabel", cfg=dict(voxel_label_enc="compact_value")),
    dict(type="Reformat"),
]
val_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type, use_img=use_img),
    dict(type="LoadImageFromFile", use_img=use_img),
    dict(type="SegPreprocess", cfg=val_preprocessor),
    dict(type="SegImagePreprocess", cfg=val_img_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="Reformat"),
]
_ds = dict(type=dataset_type, root_path=data_root, use_img=use_img,
           cam_names=cam_names, cam_attributes=cam_attributes,
           img_resized_shape=img_resized_shape)
data = dict(
    samples_per_gpu=2, workers_per_gpu=1,
    train=dict(sequences=["00"], pipeline=train_pipeline, **_ds),
    val=dict(sequences=["00"], test_mode=True, pipeline=val_pipeline, **_ds),
    test=dict(sequences=["00"], test_mode=True, pipeline=val_pipeline, **_ds),
)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
log_config = dict(interval=1)
total_epochs = 1
work_dir = "/tmp/minikitti_img_work"
