"""packed_conv3x3 == native stride-1 same-pad conv (ops/packed_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidarseg3d_tpu.ops.packed_conv import (
    pack_weights, packed_conv3x3, pick_po,
)


def native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("cin,cout,H,W,po", [
    (18, 18, 10, 24, 7),
    (18, 18, 9, 23, 7),    # W not divisible by po
    (36, 36, 8, 30, 3),
    (270, 48, 6, 15, 2),
    (12, 18, 5, 7, 7),     # W < po
    (8, 72, 4, 9, None),   # po=1 fallback -> native path
])
def test_matches_native(cin, cout, H, W, po):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    ref = native(x, w)
    got = packed_conv3x3(x, w, po=po)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pick_po():
    assert pick_po(18) == 7
    assert pick_po(36) == 3
    assert pick_po(48) == 2
    assert pick_po(72) == 1
    assert pick_po(144) == 1


def test_pack_weights_density():
    w = jnp.ones((3, 3, 4, 6))
    wp = pack_weights(w, 3)
    assert wp.shape == (3 * 5 * 4, 3 * 6)
    # each output pixel's N-slice holds exactly one 3x3xCin filter
    assert float(jnp.sum(wp != 0)) == 3 * 3 * 3 * 4 * 6


def test_gradients_flow():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 14, 18)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 18, 18)) * 0.1, jnp.float32)

    g_ref = jax.grad(lambda w: jnp.sum(native(x, w) ** 2))(w)
    g_got = jax.grad(lambda w: jnp.sum(packed_conv3x3(x, w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
