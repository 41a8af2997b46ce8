"""build_* helpers (cf. /root/reference/det3d/models/builder.py)."""

from ..utils.registry import build_from_cfg
from . import registry


def build_reader(cfg):
    return build_from_cfg(cfg, registry.READERS)


def build_backbone(cfg):
    return build_from_cfg(cfg, registry.BACKBONES)


def build_neck(cfg):
    return build_from_cfg(cfg, registry.NECKS)


def build_head(cfg):
    return build_from_cfg(cfg, registry.HEADS)


def build_point_head(cfg):
    return build_from_cfg(cfg, registry.POINT_HEADS)


def build_img_backbone(cfg):
    return build_from_cfg(cfg, registry.IMG_BACKBONES)


def build_img_head(cfg):
    return build_from_cfg(cfg, registry.IMG_HEADS)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    return build_from_cfg(
        cfg, registry.DETECTORS, dict(train_cfg=train_cfg, test_cfg=test_cfg)
    )
