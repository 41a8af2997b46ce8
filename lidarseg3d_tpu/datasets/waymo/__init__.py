from .dataset import SemanticWaymoDataset
