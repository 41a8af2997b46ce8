"""ops/resize.py: exactness of the pow-2 fast path vs jax.image.resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidarseg3d_tpu.ops.resize import resize_bilinear, upsample_into_s2d


@pytest.mark.parametrize("scale", [2, 4, 8])
@pytest.mark.parametrize("hw,c", [((5, 7), 3), ((8, 6), 18), ((4, 4), 1)])
def test_pow2_matches_jax_image_resize(scale, hw, c):
    rng = np.random.default_rng(scale * 100 + c)
    x = jnp.asarray(rng.normal(size=(2, hw[0], hw[1], c)), jnp.float32)
    out_hw = (hw[0] * scale, hw[1] * scale)
    got = resize_bilinear(x, out_hw)
    want = jax.image.resize(
        x, (2, out_hw[0], out_hw[1], c), "bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mixed_axis_scales():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 6, 5, 4)), jnp.float32)
    got = resize_bilinear(x, (12, 20))  # 2x and 4x
    want = jax.image.resize(x, (1, 12, 20, 4), "bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_non_pow2_falls_back():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 2)), jnp.float32)
    got = resize_bilinear(x, (15, 7))  # 3x and non-multiple
    want = jax.image.resize(x, (1, 15, 7, 2), "bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_identity_passthrough():
    x = jnp.ones((1, 4, 4, 2), jnp.float32)
    assert resize_bilinear(x, (4, 4)) is x


@pytest.mark.parametrize("scale", [2, 4, 8])
def test_upsample_into_s2d_matches_resize_then_s2d(scale):
    from lidarseg3d_tpu.models.img_backbones.hrnet import space_to_depth

    rng = np.random.default_rng(scale)
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 3)), jnp.float32)
    got = upsample_into_s2d(x, scale)
    want = space_to_depth(jax.image.resize(
        x, (2, 5 * scale, 7 * scale, 3), "bilinear"))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_bf16_dtype_preserved():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 8)), jnp.bfloat16)
    y = resize_bilinear(x, (8, 12))
    assert y.dtype == jnp.bfloat16
    want = jax.image.resize(
        x.astype(jnp.float32), (1, 8, 12, 8), "bilinear")
    np.testing.assert_allclose(np.asarray(y, dtype=np.float32),
                               np.asarray(want), rtol=0.02, atol=0.02)
