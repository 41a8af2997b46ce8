"""Pretrained-weight loading (HRNet ImageNet init for MSeg3D).

Mirrors the reference's partial strict=False pretrained load
(seg_mseg3d_net.py:33-40, hrnet.py:435): converted weights (see
tools/convert_hrnet_checkpoint.py) are grafted into the image-backbone
subtree of a fresh train state.
"""

import os

import numpy as np
from flax import serialization
from flax.core import unfreeze


def _merge_partial(dst, src, path="", stats=None):
    """strict=False merge: copy src leaves into dst where the key exists
    AND shapes match; count loaded/skipped/missing like torch's
    load_state_dict(strict=False) report."""
    stats = stats if stats is not None else {"loaded": 0, "skipped": [],
                                             "unexpected": []}
    for k, v in src.items():
        p = f"{path}/{k}" if path else k
        if k not in dst:
            stats["unexpected"].append(p)
            continue
        if isinstance(v, dict):
            if isinstance(dst[k], dict):
                _merge_partial(dst[k], v, p, stats)
            else:
                stats["skipped"].append(p)
            continue
        cur = dst[k]
        if np.shape(cur) == np.shape(v):
            dst[k] = v
            stats["loaded"] += 1
        else:
            stats["skipped"].append(
                f"{p}: checkpoint {np.shape(v)} vs model {np.shape(cur)}")
    return stats


def load_hrnet_pretrained(variables, msgpack_path, submodule="img_backbone_mod",
                          logger=None):
    """Merge converted HRNet weights into model variables.

    variables: {"params": ..., "batch_stats": ...} of the FULL detector.
    strict=False semantics like the reference
    (seg_mseg3d_net.py:33-40, hrnet.py:435): keys that don't exist in the
    model or whose shapes mismatch (e.g. a w48 checkpoint into a w18
    model, frozen-variant differences) are reported and skipped instead of
    surfacing later as apply-time shape errors. Missing file is a no-op
    (reference's try/except load, seg_polarnet.py:36-44).
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
    stats = _merge_partial(params[submodule], blob["params"])
    if submodule in bstats and blob.get("batch_stats"):
        _merge_partial(bstats[submodule], blob["batch_stats"], stats=stats)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = bstats
    if logger:
        logger.info(
            f"loaded pretrained HRNet from {msgpack_path}: "
            f"{stats['loaded']} tensors"
        )
        for s in stats["skipped"][:10]:
            logger.warning(f"pretrain skipped (shape mismatch): {s}")
        if stats["unexpected"]:
            logger.warning(
                f"pretrain: {len(stats['unexpected'])} unexpected keys "
                f"(e.g. {stats['unexpected'][:3]})")
    return out
