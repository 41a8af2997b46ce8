# CenterPoint-PointPillars on Waymo detection (two PFN layers, stride-1
# scatter canvas). Mirrors the reference config of the same name on this
# package's detection pipeline.

tasks = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = ["VEHICLE", "PEDESTRIAN", "CYCLIST"]

point_cloud_range = [-74.88, -74.88, -2, 74.88, 74.88, 4.0]
voxel_size = [0.32, 0.32, 6.0]
out_size_factor = 1

model = dict(
    type="PointPillars",
    pretrained=None,
    reader=dict(
        type="PillarFeatureNet",
        num_filters=(64, 64),
        num_input_features=5,
        with_distance=False,
        voxel_size=tuple(voxel_size),
        pc_range=tuple(point_cloud_range),
    ),
    backbone=dict(type="PointPillarsScatter", num_input_features=64),
    neck=dict(
        type="RPN",
        layer_nums=(3, 5, 5),
        ds_layer_strides=(1, 2, 2),
        ds_num_filters=(64, 128, 256),
        us_layer_strides=(1, 2, 4),
        us_num_filters=(128, 128, 128),
        num_input_features=64,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=128 * 3,
        tasks=tuple(tasks),
        dataset="waymo",
        weight=2,
        code_weights=(1.0,) * 8,
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2)},
    ),
)

assigner = dict(
    tasks=tasks,
    pc_range=point_cloud_range,
    voxel_size=voxel_size,
    out_size_factor=out_size_factor,
    gaussian_overlap=0.1,
    max_objs=500,
    min_radius=2,
)
train_cfg = dict(assigner=assigner)
test_cfg = dict(
    post_center_limit_range=[-80, -80, -10.0, 80, 80, 10.0],
    nms_iou_threshold=0.7,
    score_threshold=0.1,
    pc_range=point_cloud_range[:2],
    out_size_factor=out_size_factor,
    voxel_size=voxel_size[:2],
    max_out=500,
)

dataset_type = "SemanticWaymoDataset"
data_root = "data/Waymo"
nsweeps = 1

db_sampler = dict(
    db_info_path="data/Waymo/dbinfos_train.pkl",
    sample_groups=dict(VEHICLE=15, PEDESTRIAN=10, CYCLIST=10),
    min_points=5,
)
train_preprocessor = dict(
    mode="train", shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05],
    db_sampler=db_sampler, class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False,
                        class_names=class_names)

voxel_generator = dict(
    range=point_cloud_range,
    voxel_size=voxel_size,
    max_points_in_voxel=20,
    max_voxel_num=[32000, 60000],
)
capacity = dict(max_voxels=32000, max_points=180000)
ignore_label = 0

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadDetAnnotations"),
    dict(type="DetPreprocess", cfg=train_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="DetAssignLabel", cfg=assigner),
    dict(type="DetReformat"),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadDetAnnotations"),
    dict(type="DetPreprocess", cfg=val_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="DetReformat"),
]

train_anno = "data/Waymo/infos_train_01sweeps_segdet.pkl"
val_anno = "data/Waymo/infos_val_01sweeps_segdet.pkl"

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=8,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               nsweeps=nsweeps, pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno,
             test_mode=True, nsweeps=nsweeps, pipeline=test_pipeline),
    test=dict(type=dataset_type, root_path=data_root, info_path=val_anno,
              test_mode=True, nsweeps=nsweeps, pipeline=test_pipeline),
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True,
                 moving_average=False)
lr_config = dict(type="one_cycle", lr_max=3e-3, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 36
log_config = dict(interval=10)
