"""Space-to-depth HRNet branch blocks are an EXACT rewrite.

The narrow HRNet branches run their BasicBlocks in space-to-depth(2)
layout on TPU (models/img_backbones/hrnet.py, s2d_max_c); parameters are
identical to the plain layout, so the same variables must produce the
same outputs (and the same BN batch statistics) with the flag on or off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidarseg3d_tpu.models.img_backbones.hrnet import (
    HRNet, S2DConv, s2d_kernel3, s2d_down_kernel3, space_to_depth,
    depth_to_space,
)

EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(2, 2), num_channels=(4, 8)),
    stage3=dict(num_modules=2, num_branches=3, block="BASIC",
                num_blocks=(2, 2, 2), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 5)),
                    jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_s2d_kernel3_matches_plain_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_kernel3(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_s2d_down_kernel3_matches_stride2_conv():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_down_kernel3(w), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_s2dconv_module_param_tree():
    x = jnp.zeros((1, 4, 6, 4 * 5), jnp.float32)
    v = S2DConv(7).init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 5, 7)


@pytest.mark.parametrize("train", [False, True])
def test_hrnet_s2d_matches_plain(train):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 3)), jnp.float32)
    on = HRNet(extra=EXTRA, s2d_max_c=18)
    off = HRNet(extra=EXTRA, s2d_max_c=0)
    variables = on.init(jax.random.PRNGKey(0), x, train=False)
    # identical param tree: the same variables drive both layouts
    outs = {}
    for name, model in (("on", on), ("off", off)):
        if train:
            ys, mut = model.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
            outs[name] = (ys, mut["batch_stats"])
        else:
            outs[name] = (model.apply(variables, x, train=False), None)
    for a, b in zip(outs["on"][0], outs["off"][0]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    if train:
        ja = jax.tree_util.tree_leaves(outs["on"][1])
        jb = jax.tree_util.tree_leaves(outs["off"][1])
        for a, b in zip(ja, jb):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
