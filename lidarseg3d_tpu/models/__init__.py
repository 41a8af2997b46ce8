from .registry import (
    READERS, BACKBONES, NECKS, HEADS, POINT_HEADS, IMG_BACKBONES, IMG_HEADS,
    LOSSES, DETECTORS,
)
from .builder import (
    build_reader, build_backbone, build_neck, build_head, build_point_head,
    build_img_backbone, build_img_head, build_detector,
)
from .readers import voxel_encoders  # noqa: F401  (registration)
from .backbones import unet_scn  # noqa: F401
from .point_heads import batchloss_head  # noqa: F401
from .segmentors import seg_net  # noqa: F401
