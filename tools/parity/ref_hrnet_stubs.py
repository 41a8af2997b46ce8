"""Stub mmcv + load the REFERENCE torch HRNet module standalone  (import side effect:
installs sys.modules stubs and loads refpkg.models.img_backbones.hrnet).
Used by make_hrnet_manifest.py and record_golden_hrnet.py."""
import json
import sys
import types

import torch
import torch.nn as nn

# ---- stub the mmcv surface the reference files import ----


def build_conv_layer(cfg, *args, **kwargs):
    assert cfg is None, cfg
    return nn.Conv2d(*args, **kwargs)


def build_norm_layer(cfg, num_features, postfix=""):
    assert cfg is None or cfg.get("type", "BN") == "BN", cfg
    return f"bn{postfix}", nn.BatchNorm2d(num_features)


class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg

    def init_weights(self):
        pass


mmcv = types.ModuleType("mmcv")
mmcv_cnn = types.ModuleType("mmcv.cnn")
mmcv_cnn.build_conv_layer = build_conv_layer
mmcv_cnn.build_norm_layer = build_norm_layer
mmcv_cnn.build_plugin_layer = None
mmcv_runner = types.ModuleType("mmcv.runner")
mmcv_runner.BaseModule = BaseModule
mmcv_runner.ModuleList = nn.ModuleList
mmcv_runner.Sequential = nn.Sequential
mmcv_utils = types.ModuleType("mmcv.utils")
mmcv_pw = types.ModuleType("mmcv.utils.parrots_wrapper")
mmcv_pw._BatchNorm = nn.modules.batchnorm._BatchNorm
mmcv_utils.parrots_wrapper = mmcv_pw
mmcv.cnn = mmcv_cnn
mmcv.runner = mmcv_runner
mmcv.utils = mmcv_utils
for name, mod in [("mmcv", mmcv), ("mmcv.cnn", mmcv_cnn),
                  ("mmcv.runner", mmcv_runner), ("mmcv.utils", mmcv_utils),
                  ("mmcv.utils.parrots_wrapper", mmcv_pw)]:
    sys.modules[name] = mod

# fake package context so the reference files' relative imports resolve
pkg = types.ModuleType("refpkg")
pkg.__path__ = []
models = types.ModuleType("refpkg.models")
models.__path__ = []
utils_mod = types.ModuleType("refpkg.models.utils")
utils_mod.build_norm_layer = build_norm_layer
registry_mod = types.ModuleType("refpkg.models.registry")


class _Reg:
    def register_module(self, cls=None, **kw):
        return cls if cls is not None else (lambda c: c)


registry_mod.IMG_BACKBONES = _Reg()
mmseg_ops = types.ModuleType("det3d.ops.mmseg_ops")
mmseg_ops.Upsample = nn.Upsample


def resize(x, size=None, scale_factor=None, mode="nearest",
           align_corners=None, warning=True):
    return nn.functional.interpolate(x, size, scale_factor, mode,
                                     align_corners)


mmseg_ops.resize = resize
mmseg_ops.ResLayer = nn.Sequential  # only used by the ResNet class, not HRNet
det3d = types.ModuleType("det3d")
det3d.__path__ = []
det3d_ops = types.ModuleType("det3d.ops")
det3d_ops.__path__ = []
det3d.ops = det3d_ops
det3d_ops.mmseg_ops = mmseg_ops
sys.modules.update({
    "refpkg": pkg, "refpkg.models": models,
    "refpkg.models.utils": utils_mod, "refpkg.models.registry": registry_mod,
    "det3d": det3d, "det3d.ops": det3d_ops,
    "det3d.ops.mmseg_ops": mmseg_ops,
})
models.utils = utils_mod
models.registry = registry_mod

import importlib.util

ib = types.ModuleType("refpkg.models.img_backbones")
ib.__path__ = []
sys.modules["refpkg.models.img_backbones"] = ib

for mod_name, path in [
    ("refpkg.models.img_backbones.resnet_mmcv",
     "/root/reference/det3d/models/img_backbones/resnet_mmcv.py"),
    ("refpkg.models.img_backbones.hrnet",
     "/root/reference/det3d/models/img_backbones/hrnet.py"),
]:
    spec = importlib.util.spec_from_file_location(mod_name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = m
    spec.loader.exec_module(m)
    setattr(ib, mod_name.rsplit(".", 1)[1], m)

hrnet = sys.modules["refpkg.models.img_backbones.hrnet"]
