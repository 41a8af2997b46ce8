from .dataset import SemanticNuscDataset
from . import metadata
from .common import create_nuscenes_seg_infos
