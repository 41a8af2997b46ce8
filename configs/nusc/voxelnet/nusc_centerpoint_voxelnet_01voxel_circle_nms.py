# CenterPoint-VoxelNet on nuScenes detection (10-class, velocity heads,
# 10-sweep input). Mirrors /root/reference/configs/nusc/voxelnet/
# nusc_centerpoint_voxelnet_01voxel.py on this package's det pipeline.
# Box layout note: this repo keeps [x,y,z,dx,dy,dz,yaw,vx,vy] (yaw at
# column 6); the reference packs velocity at 6:8 with yaw last.
import itertools

tasks = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["truck", "construction_vehicle"]),
    dict(num_class=2, class_names=["bus", "trailer"]),
    dict(num_class=1, class_names=["barrier"]),
    dict(num_class=2, class_names=["motorcycle", "bicycle"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
voxel_size = [0.1, 0.1, 0.2]
out_size_factor = 8

model = dict(
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="MeanVoxelFeatureExtractor", num_input_features=5),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=5,
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
        dataset="nuscenes",
        weight=0.25,
        # 10 code weights: reg(2) height(1) dim(3) VEL(2, downweighted 0.2)
        # rot(2) — reference nusc_centerpoint_voxelnet_01voxel.py:49
        code_weights=(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0),
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2), "vel": (2, 2)},
        share_conv_channel=64,
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
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    # circle NMS (CenterPoint tracking recipe): per-task center-distance
    # gates, reference tools/nusc_tracking + center_head.py:473-476
    circular_nms=True,
    min_radius=[4, 12, 10, 1, 0.85, 0.175],
    nms_iou_threshold=0.2,
    score_threshold=0.1,
    pc_range=point_cloud_range[:2],
    out_size_factor=out_size_factor,
    voxel_size=voxel_size[:2],
    max_out=500,
)

dataset_type = "SemanticNuscDataset"  # det gt rides the same info pkls
data_root = "data/SemanticNusc"
nsweeps = 10

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    global_rot_noise=[-0.3925, 0.3925],
    global_scale_noise=[0.95, 1.05],
    class_names=class_names,
    min_points_in_gt=0,
)
val_preprocessor = dict(mode="val", shuffle_points=False,
                        class_names=class_names)

voxel_generator = dict(
    range=point_cloud_range,
    voxel_size=voxel_size,
    max_points_in_voxel=10,
    max_voxel_num=[120000, 160000],
)
capacity = dict(max_voxels=120000, max_points=300000)
ignore_label = 0

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type,
         nsweeps=nsweeps),
    dict(type="LoadDetAnnotations"),
    dict(type="DetPreprocess", cfg=train_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="DetAssignLabel", cfg=assigner),
    dict(type="DetReformat"),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type,
         nsweeps=nsweeps),
    dict(type="LoadDetAnnotations"),
    dict(type="DetPreprocess", cfg=val_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="DetReformat"),
]

train_anno = "data/SemanticNusc/infos_train_10sweeps_segdet.pkl"
val_anno = "data/SemanticNusc/infos_val_10sweeps_segdet.pkl"

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
lr_config = dict(type="one_cycle", lr_max=1e-3, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 20
device_ids = range(8)
log_config = dict(interval=5)
work_dir = "./work_dirs/nusc_centerpoint_voxelnet_01voxel_circle_nms"
