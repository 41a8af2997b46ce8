# SDSeg3D on nuScenes-lidarseg: TransVFE + UNetSCN3D (r=2) + batch-loss head.

num_class = 17
ignore_label = 0
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
voxel_size = [0.1, 0.1, 0.2]

model = dict(
    type="SegNet",
    pretrained=None,
    reader=dict(
        type="TransformerVoxelFeatureExtractor",
        num_input_features=5,  # nuScenes: x, y, z, intensity, ring
        num_compressed_features=16,
        num_embed=64, num_head=4, num_layers=3,
    ),
    backbone=dict(
        type="UNetSCN3D", num_input_features=16, ds_factor=8, us_factor=8,
        point_cloud_range=point_cloud_range, voxel_size=voxel_size,
        model_cfg=dict(SCALING_RATIO=2, DOWN_CAPACITY_RATIOS=(0.5, 0.25, 0.15)),
    ),
    point_head=dict(
        type="PointSegBatchlossHead", class_agnostic=False,
        num_class=num_class,
        model_cfg=dict(CONV_IN_DIM=32, CONV_CLS_FC=[64], CONV_ALIGN_DIM=64,
                       OUT_CLS_FC=[64, 64], IGNORED_LABEL=ignore_label),
    ),
)
train_cfg = dict()
test_cfg = dict(tta_flag=False, merge_type="ArithmeticMean",
                num_tta_tranforms=4)
tta_cfg = dict(num_tta_tranforms=4)

dataset_type = "SemanticNuscDataset"
data_root = "data/SemanticNusc"
nsweeps = 1
train_anno = "data/SemanticNusc/infos_train_01sweeps_segdet.pkl"
val_anno = "data/SemanticNusc/infos_val_01sweeps_segdet.pkl"
test_anno = "data/SemanticNusc/infos_test_01sweeps_segdet.pkl"

train_preprocessor = dict(
    mode="train", shuffle_points=True, npoints=100000,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05], global_translate_std=0.5,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

voxel_generator = dict(
    range=point_cloud_range, voxel_size=voxel_size,
    max_points_in_voxel=5, max_voxel_num=[120000, 120000],
)
# sized to nuScenes nsweeps=1 scans (<=34,688 pts; see MSeg3D config note)
capacity = dict(max_voxels=40960, max_points=40960)

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
    samples_per_gpu=4,
    workers_per_gpu=6,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               nsweeps=nsweeps, load_interval=1, pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno,
             test_mode=True, nsweeps=nsweeps, load_interval=1,
             pipeline=val_pipeline),
    test=dict(type=dataset_type, root_path=data_root, info_path=test_anno,
              test_mode=True, nsweeps=nsweeps, pipeline=val_pipeline),
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True,
                 moving_average=False)
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)

checkpoint_config = dict(interval=1)
log_config = dict(interval=5)
total_epochs = 48
work_dir = "./work_dirs/semnusc_transvfe_unetscn3d_batchloss_e48"
