"""HRNet torch->flax converter roundtrip on a synthetic state_dict."""

import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_hrnet_checkpoint import (
    convert, group_torch_params, record_flax_layout, _get_in,
)

TINY = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(4, 8)),
    stage3=dict(num_modules=2, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)


def synthetic_torch_sd(records, variables, rng):
    """Build a torch-ordered (module-major) state_dict matching the
    recorded flax layout, including scan-stacked stage regions."""
    import jax
    from convert_hrnet_checkpoint import _scan_region

    params = jax.device_get(variables["params"])

    def leaf_shape(kind, path):
        name = "kernel" if kind == "conv" else "scale"
        return np.shape(_get_in(params, tuple(path) + (name,)))

    def emit(sd, i, kind, shape):
        if kind == "conv":
            H, W, I, O = shape
            sd[f"m{i}.weight"] = rng.standard_normal(
                (O, I, H, W)).astype(np.float32)
        else:
            C = shape[0]
            sd[f"m{i}.weight"] = rng.standard_normal(C).astype(np.float32)
            sd[f"m{i}.bias"] = rng.standard_normal(C).astype(np.float32)
            sd[f"m{i}.running_mean"] = rng.standard_normal(C).astype(
                np.float32)
            sd[f"m{i}.running_var"] = np.abs(
                rng.standard_normal(C)).astype(np.float32)

    sd, i, r = {}, 0, 0
    while r < len(records):
        region = _scan_region(records[r][1])
        if region is None:
            kind, path = records[r]
            emit(sd, i, kind, leaf_shape(kind, path))
            i += 1
            r += 1
        else:
            j = r
            while j < len(records) and _scan_region(records[j][1]) == region:
                j += 1
            recs = records[r:j]
            M = leaf_shape(*recs[0])[0]
            for m in range(M):
                for kind, path in recs:
                    emit(sd, i, kind, leaf_shape(kind, path)[1:])
                    i += 1
            r = j
    return sd


def test_converter_roundtrip():
    rng = np.random.default_rng(0)
    model, variables, records = record_flax_layout(TINY)
    sd = synthetic_torch_sd(records, variables, rng)
    out = convert(sd, TINY)

    # spot check: first conv kernel transposed correctly
    kind0, path0 = records[0]
    assert kind0 == "conv"
    w_t = sd["m0.weight"]
    w_f = _get_in(out["params"], tuple(path0) + ("kernel",))
    np.testing.assert_array_equal(w_f, w_t.transpose(2, 3, 1, 0))

    # every torch running_mean landed SOMEWHERE in batch_stats (scan
    # regions restack module-major groups, so record index != sd index)
    import jax as _jax
    all_means = [np.asarray(l).reshape(-1) for l in
                 _jax.tree_util.tree_leaves(out["batch_stats"])]
    flat = np.concatenate(all_means)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            assert np.isin(np.round(v, 6), np.round(flat, 6)).all(), k

    # converted tree loads into the model and produces finite outputs
    import jax
    import jax.numpy as jnp
    y = model.apply(
        {"params": out["params"], "batch_stats": out["batch_stats"]},
        jnp.ones((1, 64, 64, 3)), train=False,
    )
    assert all(np.isfinite(np.asarray(t)).all() for t in y)


def test_converter_shape_mismatch_raises():
    rng = np.random.default_rng(1)
    model, variables, records = record_flax_layout(TINY)
    sd = synthetic_torch_sd(records, variables, rng)
    k0 = "m0.weight"
    sd[k0] = rng.standard_normal((7, 3, 3, 3)).astype(np.float32)  # wrong Cout
    with pytest.raises(AssertionError):
        convert(sd, TINY)


def _manifest_sd(width, value_fn):
    """Synthetic state_dict in the AUTHORITATIVE mmcv key order + shapes
    (tests/data/hrnetv2_w{width}_manifest.json, extracted from the
    reference torch HRNet module — tools/parity/make_hrnet_manifest.py)."""
    import json

    path = os.path.join(os.path.dirname(__file__), "data",
                        f"hrnetv2_w{width}_manifest.json")
    with open(path) as f:
        man = json.load(f)
    sd = {}
    for key, shape in man["entries"]:
        sd[key] = value_fn(key, tuple(shape))
    return sd


@pytest.mark.parametrize("width", [18, 48])
def test_real_checkpoint_manifest(width):
    """The converter's sequential flax-order pairing must map the REAL
    mmcv hrnetv2 checkpoint layout (full key order + shapes, 1525 tensors)
    with every per-layer shape assert passing. Set HRNET_W18_PTH /
    HRNET_W48_PTH to additionally run the conversion on a real downloaded
    checkpoint's tensors."""
    from convert_hrnet_checkpoint import HRNET_EXTRA

    pth = os.environ.get(f"HRNET_W{width}_PTH")
    if pth:
        import torch

        sd = torch.load(pth, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    else:
        rng = np.random.default_rng(width)
        sd = _manifest_sd(
            width,
            lambda k, s: (np.abs(rng.standard_normal(s))
                          if "running_var" in k
                          else rng.standard_normal(s)).astype(np.float32))
    out = convert(sd, HRNET_EXTRA[width])

    # the stem's first torch conv must land at the flax stem conv
    _, variables, records = record_flax_layout(HRNET_EXTRA[width])
    k0, p0 = records[0]
    assert k0 == "conv"
    w0 = next(v for k, v in sd.items() if k == "conv1.weight")
    np.testing.assert_array_equal(
        _get_in(out["params"], tuple(p0) + ("kernel",)),
        w0.transpose(2, 3, 1, 0))
    # and the LAST bn group (last module of the last scanned stage) must
    # land at the last recorded flax bn — at stacked slice M-1
    last_bn_path = next(p for k, p in reversed(records) if k == "bn")
    bn_keys = [k for k in sd if k.endswith("running_mean")]
    got = np.asarray(_get_in(out["batch_stats"],
                             tuple(last_bn_path) + ("mean",)))
    want = sd[bn_keys[-1]]
    if got.ndim > want.ndim:  # scan-stacked leaf
        got = got[-1]
    np.testing.assert_array_equal(got, want)


def test_pretrained_partial_load_strict_false(tmp_path):
    """strict=False graft (reference seg_mseg3d_net.py:33-40): matching
    tensors load, shape mismatches and unexpected keys are skipped with a
    report instead of erroring at apply time."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from lidarseg3d_tpu.apis.pretrain import load_hrnet_pretrained
    from lidarseg3d_tpu.models import build_img_backbone

    m = build_img_backbone(dict(type="HRNet", extra=TINY))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False)
    blob_params = jax.tree.map(
        lambda a: np.full(a.shape, 7.0, np.float32), variables["params"])
    blob_stats = jax.tree.map(
        lambda a: np.full(a.shape, 3.0, np.float32),
        variables["batch_stats"])
    # poison one leaf with a wrong shape + add an unexpected key
    import flax
    blob_params = flax.core.unfreeze(blob_params) if hasattr(
        flax.core, "unfreeze") else dict(blob_params)
    k0 = next(iter(blob_params))
    sub = blob_params[k0]
    kk = next(k for k in sub if "Conv" in k or "kernel" in str(sub[k]))
    orig_shape = None
    def poison(t):
        for k, v in t.items():
            if isinstance(v, dict):
                if poison(v):
                    return True
            elif k == "kernel":
                t[k] = np.zeros((1, 2, 3), np.float32)  # wrong shape
                return True
        return False
    import copy
    blob_params = copy.deepcopy(jax.tree.map(np.asarray, blob_params))
    assert poison(blob_params)
    blob_params["not_a_module"] = {"kernel": np.ones((2, 2), np.float32)}
    path = str(tmp_path / "hrnet.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": blob_params,
             "batch_stats": jax.tree.map(np.asarray, blob_stats)}))

    full = {"params": {"img_backbone_mod": variables["params"]},
            "batch_stats": {"img_backbone_mod": variables["batch_stats"]}}

    class L:
        msgs = []
        def info(self, m): self.msgs.append(m)
        def warning(self, m): self.msgs.append(m)

    out = load_hrnet_pretrained(full, path, logger=L())
    newp = out["params"]["img_backbone_mod"]
    leaves = jax.tree_util.tree_leaves(newp)
    # most tensors loaded (value 7); the poisoned one kept its init value
    n7 = sum(bool(np.all(np.asarray(l) == 7.0)) for l in leaves)
    assert n7 >= len(leaves) - 1
    assert not any(np.asarray(l).shape == (1, 2, 3) for l in leaves)
    # batch stats loaded too
    sl = jax.tree_util.tree_leaves(out["batch_stats"]["img_backbone_mod"])
    assert all(np.all(np.asarray(l) == 3.0) for l in sl)


def test_with_cp_matches_plain():
    """with_cp=True (mmcv HRNet's torch.utils.checkpoint parity) keeps the
    param tree, loss, and gradients identical to the plain backbone."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lidarseg3d_tpu.models import build_img_backbone

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(
            np.float32))
    results = {}
    for cp in (False, True):
        m = build_img_backbone(dict(type="HRNet", extra=TINY, with_cp=cp))
        v = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(p, v=v, m=m):
            ys, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(y.sum() for y in ys)

        l, g = jax.value_and_grad(loss)(v["params"])
        results[cp] = (float(l), g)

    assert np.allclose(results[False][0], results[True][0], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(results[False][1]),
                    jax.tree_util.tree_leaves(results[True][1])):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-4 * (np.abs(a).max() + 1e-9)
