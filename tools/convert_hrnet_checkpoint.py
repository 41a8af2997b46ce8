#!/usr/bin/env python
"""Convert a torch (mmcv/mmseg) HRNetV2 checkpoint to flax params.

The reference loads ImageNet-pretrained HRNet weights
(det3d/models/img_backbones/hrnet.py:435, configs/*/MSeg3D/hrnet_cfg.py).
This tool maps a torch state_dict onto our flax HRNet by walking both in
module order: mmcv defines HRNet submodules in exactly the order our flax
module executes them (stem -> layer1 -> transition -> branches -> fuse, per
stage), so a sequential conv/bn pairing with strict shape checks is a
faithful mapping.

Usage:
  python tools/convert_hrnet_checkpoint.py IN.pth OUT.msgpack \
      --width 18   # or 48

The output .msgpack holds {"params": ..., "batch_stats": ...} for the
HRNet submodule, loadable via lidarseg3d_tpu.apis.pretrain.load_hrnet.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


HRNET_EXTRA = {
    18: dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(4, 4), num_channels=(18, 36)),
        stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                    num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
        stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                    num_blocks=(4, 4, 4, 4), num_channels=(18, 36, 72, 144)),
    ),
    48: dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(4, 4), num_channels=(48, 96)),
        stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                    num_blocks=(4, 4, 4), num_channels=(48, 96, 192)),
        stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                    num_blocks=(4, 4, 4, 4), num_channels=(48, 96, 192, 384)),
    ),
}


def record_flax_layout(extra, image_size=(64, 64)):
    """Init our flax HRNet while recording (kind, path) of every Conv /
    MaskedBatchNorm call in execution order."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from lidarseg3d_tpu.models import build_img_backbone

    records = []
    seen = set()

    def interceptor(next_fn, args, kwargs, context):
        name = type(context.module).__name__
        if context.method_name == "__call__" and name in (
            "Conv", "S2DConv", "MaskedBatchNorm"
        ):
            # S2DConv stores the SAME plain-layout [3,3,Cin,Cout] kernel
            # (hrnet.py: rearranged at apply time), so it converts as conv
            kind = "bn" if name == "MaskedBatchNorm" else "conv"
            path = context.module.path
            # nn.scan re-executes its body during init (shape pre-pass +
            # per-length passes); keep first occurrence only — the scan
            # region's M comes from the stacked param leading dim
            if path not in seen:
                seen.add(path)
                records.append((kind, path))
        return next_fn(*args, **kwargs)

    model = build_img_backbone(dict(type="HRNet", extra=extra))
    with nn.intercept_methods(interceptor):
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, image_size[0], image_size[1], 3)), train=False,
        )
    return model, variables, records


def group_torch_params(state_dict):
    """Sequential (kind, tensors) groups from a torch state_dict:
    conv -> [weight]; bn -> [weight, bias, running_mean, running_var]."""
    items = [
        (k, np.asarray(v)) for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    ]
    groups = []
    i = 0
    while i < len(items):
        k, v = items[i]
        if v.ndim == 4:  # conv weight [Cout, Cin, kh, kw]
            groups.append(("conv", [v], k))
            i += 1
        elif v.ndim == 1:
            # bn group: weight, bias, running_mean, running_var
            ks = [items[i + j][0] for j in range(4)]
            assert ks[0].endswith("weight") and ks[1].endswith("bias"), ks
            assert "running_mean" in ks[2] and "running_var" in ks[3], ks
            groups.append(("bn", [items[i + j][1] for j in range(4)], k))
            i += 4
        else:
            raise ValueError(f"unexpected tensor {k} with shape {v.shape}")
    return groups


def set_in(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _scan_region(path):
    """Prefix of a record path up to the nn.scan boundary, or None.

    Scanned HRNet stages execute once but hold weights stacked on a
    leading num_modules axis under '.../HRModuleStack_i/scan/...'
    (models/img_backbones/hrnet.py HRModuleStack)."""
    for i, p in enumerate(path):
        if p == "scan":
            return path[: i + 1]
    return None


def _assign_group(params, bstats, kind_t, tensors, key, kind_f, path,
                  slice_m=None):
    """Write one torch conv/bn group at a flax record path. slice_m=None
    writes the whole leaf; an int writes row m of a scan-stacked leaf."""

    def put(tree, p, val):
        cur = _get_in(tree, p)
        val = val.astype(np.float32)
        if slice_m is None:
            assert cur.shape == val.shape, (key, p, val.shape, cur.shape)
            set_in(tree, p, val)
        else:
            assert cur.shape[1:] == val.shape, (key, p, val.shape, cur.shape)
            cur = np.asarray(cur).copy()
            cur[slice_m] = val
            set_in(tree, p, cur)

    assert kind_t == kind_f, f"{key}: torch {kind_t} vs flax {kind_f} at {path}"
    if kind_t == "conv":
        put(params, path + ("kernel",), tensors[0].transpose(2, 3, 1, 0))
    else:
        scale, bias, mean, var = tensors
        put(params, path + ("scale",), scale)
        put(params, path + ("bias",), bias)
        put(bstats, path + ("mean",), mean)
        put(bstats, path + ("var",), var)


def convert(state_dict, extra):
    model, variables, records = record_flax_layout(extra)
    groups = group_torch_params(state_dict)
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = jax.device_get(params)
    params = _to_mutable(params)
    bstats = _to_mutable(jax.device_get(variables.get("batch_stats", {})))

    # partition records into plain runs and scan regions
    segments = []
    i = 0
    while i < len(records):
        region = _scan_region(records[i][1])
        if region is None:
            segments.append(("plain", [records[i]]))
            i += 1
        else:
            j = i
            while j < len(records) and _scan_region(records[j][1]) == region:
                j += 1
            segments.append(("scan", records[i:j]))
            i = j

    # expected torch group count: scan regions consume num_modules * L
    def region_m(recs):
        kind, path = recs[0]
        leaf = _get_in(params, path + ("kernel" if kind == "conv"
                                       else "scale",))
        return int(np.shape(leaf)[0])

    expected = sum(
        len(recs) if seg == "plain" else region_m(recs) * len(recs)
        for seg, recs in segments
    )
    assert expected == len(groups), (
        f"torch has {len(groups)} conv/bn groups, flax layout expects "
        f"{expected} — structure mismatch"
    )

    gi = 0
    for seg, recs in segments:
        if seg == "plain":
            (kind_f, path), (kind_t, tensors, key) = recs[0], groups[gi]
            gi += 1
            _assign_group(params, bstats, kind_t, tensors, key, kind_f, path)
        else:
            # mmcv's state_dict is module-major (stage3.0.*, stage3.1.*,
            # ...); the scan stacks module m at leading index m of each
            # layer's leaf
            M, L = region_m(recs), len(recs)
            for m in range(M):
                for l, (kind_f, path) in enumerate(recs):
                    kind_t, tensors, key = groups[gi + m * L + l]
                    _assign_group(params, bstats, kind_t, tensors, key,
                                  kind_f, path, slice_m=m)
            gi += M * L
    return {"params": params, "batch_stats": bstats}


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    try:  # FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree


def _get_in(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="torch .pth checkpoint")
    ap.add_argument("output", help="output .msgpack")
    ap.add_argument("--width", type=int, default=18, choices=[18, 48])
    args = ap.parse_args()

    import torch
    from flax import serialization

    sd = torch.load(args.input, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    out = convert(sd, HRNET_EXTRA[args.width])
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
