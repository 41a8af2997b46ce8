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
    """Build a torch-ordered state_dict matching the recorded flax layout."""
    import jax
    params = jax.device_get(variables["params"])
    sd = {}
    for i, (kind, path) in enumerate(records):
        if kind == "conv":
            k = _get_in(params, tuple(path) + ("kernel",))
            w = rng.standard_normal(
                (k.shape[3], k.shape[2], k.shape[0], k.shape[1])
            ).astype(np.float32)
            sd[f"m{i}.weight"] = w
        else:
            s = _get_in(params, tuple(path) + ("scale",))
            C = s.shape[0]
            sd[f"m{i}.weight"] = rng.standard_normal(C).astype(np.float32)
            sd[f"m{i}.bias"] = rng.standard_normal(C).astype(np.float32)
            sd[f"m{i}.running_mean"] = rng.standard_normal(C).astype(np.float32)
            sd[f"m{i}.running_var"] = np.abs(
                rng.standard_normal(C)
            ).astype(np.float32)
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

    # all bn stats landed
    for i, (kind, path) in enumerate(records):
        if kind == "bn":
            np.testing.assert_array_equal(
                _get_in(out["batch_stats"], tuple(path) + ("mean",)),
                sd[f"m{i}.running_mean"],
            )

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
