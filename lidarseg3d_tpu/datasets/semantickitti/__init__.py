from .dataset import SemanticKITTIDataset
from . import metadata
