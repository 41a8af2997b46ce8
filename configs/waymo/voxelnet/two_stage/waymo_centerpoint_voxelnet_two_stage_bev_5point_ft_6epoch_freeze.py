# Two-stage CenterPoint on Waymo: first-stage VoxelNet proposals refined by
# BEV 5-point feature extraction + RoIHead IoU rectification. Mirrors the
# reference config of the same name.

from configs.waymo.voxelnet.waymo_centerpoint_voxelnet_3x import *  # noqa

first_stage_cfg = model  # noqa: F405 (the single-stage config's model)

model = dict(
    type="TwoStageDetector",
    first_stage_cfg=first_stage_cfg,
    second_stage_modules=(
        dict(
            type="BEVFeatureExtractor",
            pc_start=point_cloud_range[:2],  # noqa: F405
            voxel_size=voxel_size[:2],  # noqa: F405
            out_stride=out_size_factor,  # noqa: F405
        ),
    ),
    roi_head=dict(
        type="RoIHead",
        input_channels=512 * 5,
        num_class=1,
        code_size=7,
        model_cfg=dict(
            SHARED_FC=(256, 256),
            CLS_FC=(256, 256),
            REG_FC=(256, 256),
            DP_RATIO=0.3,
            TARGET_CONFIG=dict(REG_FG_THRESH=0.55, CLS_FG_THRESH=0.75,
                               CLS_BG_THRESH=0.25),
            LOSS_CONFIG=dict(LOSS_WEIGHTS=dict(
                rcnn_cls_weight=1.0, rcnn_reg_weight=1.0,
                code_weights=[1.0] * 7)),
        ),
    ),
    NMS_POST_MAXSIZE=500,
    num_point=5,
    freeze=True,
)

total_epochs = 6
lr_config = dict(type="one_cycle", lr_max=3e-4, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
