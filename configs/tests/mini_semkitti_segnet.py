# Tiny smoke config: SegNet on a miniature synthetic SemanticKITTI layout.
num_class = 20
point_cloud_range = [-6.0, -6.0, -2.0, 6.0, 6.0, 2.0]
voxel_size = [0.3, 0.3, 0.4]
ignore_label = 0

model = dict(
    type="SegNet",
    reader=dict(type="TransformerVoxelFeatureExtractor", num_input_features=4,
                num_compressed_features=16, num_embed=32, num_head=4,
                num_layers=1),
    backbone=dict(type="UNetSCN3D", num_input_features=16,
                  point_cloud_range=point_cloud_range, voxel_size=voxel_size,
                  model_cfg=dict(SCALING_RATIO=1)),
    point_head=dict(type="PointSegBatchlossHead", class_agnostic=False,
                    num_class=num_class,
                    model_cfg=dict(CONV_IN_DIM=16, CONV_CLS_FC=[32],
                                   CONV_ALIGN_DIM=32, OUT_CLS_FC=[32],
                                   IGNORED_LABEL=ignore_label)),
)
train_cfg = dict()
test_cfg = dict()

dataset_type = "SemanticKITTIDataset"
data_root = "/tmp/minikitti/sequences"

train_preprocessor = dict(mode="train", shuffle_points=True, npoints=1400,
                          global_rot_noise=[-0.785, 0.785],
                          global_scale_noise=[0.95, 1.05],
                          global_translate_std=0.5)
val_preprocessor = dict(mode="val", shuffle_points=False)
voxel_generator = dict(range=point_cloud_range, voxel_size=voxel_size,
                       max_points_in_voxel=5, max_voxel_num=[2000, 2000])
capacity = dict(max_voxels=1024, max_points=1536)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=False),
    dict(type="SegPreprocess", cfg=train_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="SegAssignLabel", cfg=dict(voxel_label_enc="compact_value")),
    dict(type="Reformat"),
]
val_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="SegPreprocess", cfg=val_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="Reformat"),
]
data = dict(
    samples_per_gpu=2, workers_per_gpu=1,
    train=dict(type=dataset_type, root_path=data_root, sequences=["00"],
               pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, sequences=["08"],
             test_mode=True, pipeline=val_pipeline),
    test=dict(type=dataset_type, root_path=data_root, sequences=["08"],
              test_mode=True, pipeline=val_pipeline),
)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
log_config = dict(interval=1)
total_epochs = 2
work_dir = "/tmp/minikitti_work"
