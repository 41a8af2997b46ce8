# Tiny CenterPoint-VoxelNet for CI / demo-tool smoke tests: the
# waymo_centerpoint_voxelnet_3x.py schema on a 20 m / coarse grid so CPU
# compiles stay fast.

tasks = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = ["VEHICLE", "PEDESTRIAN", "CYCLIST"]

point_cloud_range = [-10.0, -10.0, -2.0, 10.0, 10.0, 4.0]
voxel_size = [0.25, 0.25, 0.375]
out_size_factor = 8

model = dict(
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="MeanVoxelFeatureExtractor", num_input_features=5),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=5,
                  ds_factor=8),
    neck=dict(
        type="RPN",
        layer_nums=(1, 1),
        ds_layer_strides=(1, 2),
        ds_num_filters=(32, 64),
        us_layer_strides=(1, 2),
        us_num_filters=(64, 64),
        num_input_features=64,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=128,
        tasks=tuple(tasks),
        dataset="waymo",
        weight=2,
        code_weights=(1.0,) * 8,
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2)},
        share_conv_channel=32,
    ),
)

assigner = dict(
    tasks=tasks,
    pc_range=point_cloud_range,
    voxel_size=voxel_size,
    out_size_factor=out_size_factor,
    gaussian_overlap=0.1,
    max_objs=50,
    min_radius=2,
)
train_cfg = dict(assigner=assigner)
test_cfg = dict(
    post_center_limit_range=[-12, -12, -10.0, 12, 12, 10.0],
    nms_iou_threshold=0.7,
    score_threshold=0.05,
    pc_range=point_cloud_range[:2],
    out_size_factor=out_size_factor,
    voxel_size=voxel_size[:2],
    max_out=20,
)

dataset_type = "SemanticWaymoDataset"
data_root = "data/Waymo"
nsweeps = 1

voxel_generator = dict(
    range=point_cloud_range,
    voxel_size=voxel_size,
    max_points_in_voxel=5,
    max_voxel_num=[4000, 4000],
)

capacity = dict(max_voxels=4000, max_points=20000)

val_preprocessor = dict(mode="val", shuffle_points=False,
                        class_names=class_names)

test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="DetPreprocess", cfg=val_preprocessor),
    dict(type="SegVoxelization", cfg=voxel_generator),
    dict(type="DetReformat"),
]
