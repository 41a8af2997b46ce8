# Cylinder3D on nuScenes-lidarseg: dynamic cylindrical VFE + asymmetric
# sparse UNet -> dense logits -> point head.
import numpy as np

num_class = 17
ignore_label = 0
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
voxel_size = [0.1, 0.1, 0.2]
cylindrical_range = [0, -np.pi, -5.0, 51.2, np.pi, 3.0]
cylindrical_grid_size = [480, 360, 32]

model = dict(
    type="SegPolarNet",
    pretrained=None,
    reader=dict(
        type="Cylinder3DDynamicVoxelFeatureExtractor",
        grid_size=cylindrical_grid_size,
        point_cloud_range=cylindrical_range,
        average_points=False,
        num_input_features=5,
        num_output_features=256,
        fea_compre=16,
        max_voxels=120000,
        voxel_label_enc="major",
        num_class=num_class,
    ),
    backbone=dict(
        type="Cylinder3D_Asymm_3d_spconv",
        output_shape=cylindrical_grid_size,
        num_input_features=16,
        nclasses=num_class,
        n_height=cylindrical_grid_size[-1],
        init_size=16,
    ),
    point_head=dict(
        type="PointSegPolarNetHead", class_agnostic=False,
        num_class=num_class, model_cfg=dict(IGNORED_LABEL=0),
    ),
)
train_cfg = dict()
test_cfg = dict()

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

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=False),
    dict(type="SegPreprocess", cfg=train_preprocessor),
    dict(type="Reformat"),
]
val_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="SegPreprocess", cfg=val_preprocessor),
    dict(type="Reformat"),
]
# sized to nuScenes nsweeps=1 scans (<=34,688 pts; see MSeg3D config note)
capacity = dict(max_points=40960)

data = dict(
    samples_per_gpu=2, workers_per_gpu=6,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               nsweeps=nsweeps, pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno,
             test_mode=True, nsweeps=nsweeps, pipeline=val_pipeline),
    test=dict(type=dataset_type, root_path=data_root, info_path=test_anno,
              test_mode=True, nsweeps=nsweeps, pipeline=val_pipeline),
)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.01, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
checkpoint_config = dict(interval=1)
log_config = dict(interval=5)
total_epochs = 12
work_dir = "./work_dirs/semnusc_dymanicvfe_cylinder3d_lr1en2_e12"
