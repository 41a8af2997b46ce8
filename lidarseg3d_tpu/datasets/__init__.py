from .registry import DATASETS, PIPELINES
from .builder import build_dataset
from .pipelines import compose, loading, seg_preprocess  # noqa: F401 (registration)
from .pipelines import instance_aug  # noqa: F401
from .pipelines import det_pipeline  # noqa: F401
from .semantickitti import dataset as _semkitti  # noqa: F401
from .nuscenes import dataset as _semnusc  # noqa: F401
from .waymo import dataset as _semwaymo  # noqa: F401
from .loader import SegDataLoader, EpochSampler
from .batching import collate_segnet
