# MSeg3D lidar-only ablation baseline: same ImprovedMeanVFE + UNetSCN3D
# trunk as the multimodal config, plain SegNet + batch-loss head (no camera
# branch). Mirrors the reference config of the same name.

from configs.semantickitti.MSeg3D.semkitti_avgvfe_unetscn3d_hrnetw18_lr1en2_e12 import *  # noqa

use_img = False
model = dict(
    type="SegNet",
    pretrained=None,
    reader=dict(type="ImprovedMeanVoxelFeatureExtractor",
                num_input_features=4),
    backbone=dict(
        type="UNetSCN3D", num_input_features=4 + 8, ds_factor=8,
        us_factor=8,
        point_cloud_range=point_cloud_range, voxel_size=voxel_size,  # noqa: F405
        model_cfg=dict(SCALING_RATIO=2,
                       DOWN_CAPACITY_RATIOS=(0.5, 0.25, 0.15)),
    ),
    point_head=dict(
        type="PointSegBatchlossHead", class_agnostic=False,
        num_class=num_class,  # noqa: F405
        model_cfg=dict(CONV_IN_DIM=32, CONV_CLS_FC=[64], CONV_ALIGN_DIM=64,
                       OUT_CLS_FC=[64, 64], IGNORED_LABEL=0),
    ),
)

# lidar-only pipelines: strip the image stages
_IMG_STAGES = ("LoadImageFromFile", "LoadImageAnnotations",
               "SegImagePreprocess")
train_pipeline = [st for st in train_pipeline  # noqa: F405
                  if st["type"] not in _IMG_STAGES]
val_pipeline = [st for st in val_pipeline  # noqa: F405
                if st["type"] not in _IMG_STAGES]
for _split in ("train", "val", "test"):
    data[_split] = dict(data[_split])  # noqa: F405
    data[_split]["use_img"] = False
    data[_split]["pipeline"] = (train_pipeline if _split == "train"
                                else val_pipeline)
