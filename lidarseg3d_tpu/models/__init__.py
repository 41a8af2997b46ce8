from .registry import (
    READERS, BACKBONES, NECKS, HEADS, POINT_HEADS, IMG_BACKBONES, IMG_HEADS,
    LOSSES, DETECTORS,
)
from .builder import (
    build_reader, build_backbone, build_neck, build_head, build_point_head,
    build_img_backbone, build_img_head, build_detector,
)
from .readers import voxel_encoders  # noqa: F401  (registration)
from .readers import dynamic_vfe  # noqa: F401
from .backbones import unet_scn  # noqa: F401
from .backbones import polarnet_unet  # noqa: F401
from .backbones import cylinder3d  # noqa: F401
from .backbones import scn_det  # noqa: F401
from .necks import rpn  # noqa: F401
from .bbox_heads import center_head  # noqa: F401
from .segmentors import voxelnet  # noqa: F401
from .segmentors import point_pillars  # noqa: F401
from .segmentors import two_stage  # noqa: F401
from .readers import pillar_encoder  # noqa: F401
from .second_stage import bev_extractor  # noqa: F401
from .roi_heads import roi_head  # noqa: F401
from .img_backbones import hrnet  # noqa: F401
from .img_backbones import resnet  # noqa: F401
from .img_heads import fcn_mseg3d_head  # noqa: F401
from .img_heads import fcn_head  # noqa: F401
from .point_heads import batchloss_head  # noqa: F401
from .point_heads import polarnet_head  # noqa: F401
from .point_heads import mseg3d_head  # noqa: F401
from .segmentors import seg_net  # noqa: F401
from .segmentors import seg_polarnet  # noqa: F401
from .segmentors import seg_mseg3d  # noqa: F401
