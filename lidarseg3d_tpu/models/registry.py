"""Model registries, mirroring /root/reference/det3d/models/registry.py."""

from ..utils.registry import Registry

READERS = Registry("reader")
BACKBONES = Registry("backbone")
NECKS = Registry("neck")
HEADS = Registry("head")
POINT_HEADS = Registry("point_head")
IMG_BACKBONES = Registry("img_backbone")
IMG_HEADS = Registry("img_head")
LOSSES = Registry("loss")
DETECTORS = Registry("detector")
SECOND_STAGE = Registry("second_stage")
ROI_HEAD = Registry("roi_head")
