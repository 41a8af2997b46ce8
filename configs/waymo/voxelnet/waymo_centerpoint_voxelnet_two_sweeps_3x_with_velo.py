# CenterPoint-VoxelNet on Waymo detection, TWO-SWEEP input with velocity
# regression (the tracking recipe). Mirrors /root/reference/configs/waymo/
# voxelnet/waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo.py on this
# package's det pipeline; box layout [x,y,z,l,w,h,yaw,vx,vy] (yaw at 6).

tasks = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = ["VEHICLE", "PEDESTRIAN", "CYCLIST"]

point_cloud_range = [-75.2, -75.2, -2, 75.2, 75.2, 4.0]
voxel_size = [0.1, 0.1, 0.15]
out_size_factor = 8

model = dict(
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="MeanVoxelFeatureExtractor", num_input_features=6),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=6,
                  ds_factor=8),
    neck=dict(
        type="RPN",
        layer_nums=(5, 5),
        ds_layer_strides=(1, 2),
        ds_num_filters=(128, 256),
        us_layer_strides=(1, 2),
        us_num_filters=(256, 256),
        num_input_features=256,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=512,
        tasks=tuple(tasks),
        dataset="waymo",
        weight=2,
        code_weights=(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2), "vel": (2, 2)},
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

dataset_type = "SemanticWaymoDataset"  # det annotations ride the same pkls
data_root = "data/Waymo"
nsweeps = 2

db_sampler = dict(
    db_info_path="data/Waymo/dbinfos_train.pkl",
    sample_groups=dict(VEHICLE=15, PEDESTRIAN=10, CYCLIST=10),
    min_points=5,
)

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05],
    db_sampler=db_sampler,
    class_names=class_names,
    min_points_in_gt=0,
)
val_preprocessor = dict(mode="val", shuffle_points=False,
                        class_names=class_names)

voxel_generator = dict(
    range=point_cloud_range,
    voxel_size=voxel_size,
    max_points_in_voxel=5,
    max_voxel_num=[150000, 150000],
)
capacity = dict(max_voxels=150000, max_points=180000)
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
