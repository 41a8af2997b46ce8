"""Pretrained-weight loading (HRNet ImageNet init for MSeg3D).

Mirrors the reference's partial strict=False pretrained load
(seg_mseg3d_net.py:33-40, hrnet.py:435): converted weights (see
tools/convert_hrnet_checkpoint.py) are grafted into the image-backbone
subtree of a fresh train state.
"""

import os

from flax import serialization
from flax.core import unfreeze


def load_hrnet_pretrained(variables, msgpack_path, submodule="img_backbone_mod",
                          logger=None):
    """Merge converted HRNet weights into model variables.

    variables: {"params": ..., "batch_stats": ...} of the FULL detector.
    Returns updated variables; missing file is a no-op (like the reference's
    try/except load, seg_polarnet.py:36-44).
    """
    if not os.path.isfile(msgpack_path):
        if logger:
            logger.warning(f"pretrained HRNet not found: {msgpack_path}")
        return variables
    with open(msgpack_path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    params = unfreeze(variables["params"])
    bstats = unfreeze(variables.get("batch_stats", {}))
    if submodule not in params:
        if logger:
            logger.warning(f"no {submodule} in model params; skip pretrain")
        return variables
    params[submodule] = blob["params"]
    if submodule in bstats and blob.get("batch_stats"):
        bstats[submodule] = blob["batch_stats"]
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = bstats
    if logger:
        logger.info(f"loaded pretrained HRNet from {msgpack_path}")
    return out
