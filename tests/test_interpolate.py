"""Grid-27 3-NN interpolation vs. exact brute-force 3-NN."""

import numpy as np
import jax.numpy as jnp

from lidarseg3d_tpu.ops import sparse as sp
from lidarseg3d_tpu.ops import interpolate as interp


def test_grid_interpolate_matches_exact():
    rng = np.random.default_rng(0)
    # dense-ish voxel occupancy so the 3 nearest are inside the 27-neighborhood
    shape = (6, 12, 12)
    vs = [0.5, 0.5, 0.5]
    pcr = [0.0, 0.0, 0.0, 6.0, 6.0, 3.0]
    B, Vc, C = 2, 600, 8
    coords = np.full((B, Vc, 3), -1, np.int32)
    feats = np.zeros((B, Vc, C), np.float32)
    nums = np.zeros((B,), np.int32)
    for b in range(B):
        total = shape[0] * shape[1] * shape[2]
        n = min(Vc, int(total * 0.65))
        lin = np.sort(rng.choice(total, n, replace=False))
        z = lin // (shape[1] * shape[2])
        rem = lin % (shape[1] * shape[2])
        coords[b, :n] = np.stack([z, rem // shape[2], rem % shape[2]], 1)
        feats[b, :n] = rng.standard_normal((n, C)).astype(np.float32)
        nums[b] = n

    struct = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape)
    centers = np.asarray(sp.voxel_centers(struct, vs, pcr))

    N = 200
    # query points INSIDE occupied voxels (the real devox use-case: every
    # point generated its own voxel)
    pts = np.zeros((B, N, 3), np.float32)
    for b in range(B):
        pick = rng.integers(0, nums[b], size=N)
        jitter = rng.uniform(-0.24, 0.24, size=(N, 3)).astype(np.float32)
        pts[b] = centers[b, pick] + jitter
    pvalid = np.ones((B, N), bool)
    pvalid[:, -5:] = False  # padded points

    got = np.asarray(
        interp.grid_three_interpolate(
            jnp.asarray(pts), jnp.asarray(pvalid), struct, jnp.asarray(feats),
            vs, pcr,
        )
    )

    # exact oracle per sample
    for b in range(B):
        d2, idx = interp.exact_three_nn(
            jnp.asarray(pts[b]), jnp.asarray(centers[b]),
            jnp.asarray(np.arange(Vc) < nums[b]), chunk=128,
        )
        d2, idx = np.asarray(d2), np.asarray(idx)
        w = 1.0 / (d2 + 1e-8)
        w = w / w.sum(1, keepdims=True)
        want = (feats[b][np.clip(idx, 0, Vc - 1)] * w[..., None]).sum(1)
        want[~pvalid[b]] = 0
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_interpolate_zero_for_out_of_range_points():
    shape = (4, 4, 4)
    vs = [1.0, 1.0, 1.0]
    pcr = [0, 0, 0, 4, 4, 4]
    coords = np.zeros((1, 4, 3), np.int32)
    coords[0] = [[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3]]
    nums = np.array([4], np.int32)
    feats = np.ones((1, 4, 2), np.float32)
    struct = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape)
    pts = np.array([[[100.0, 100.0, 100.0], [0.5, 0.5, 0.5]]], np.float32)
    out = np.asarray(
        interp.grid_three_interpolate(
            jnp.asarray(pts), jnp.ones((1, 2), bool), struct, jnp.asarray(feats),
            vs, pcr,
        )
    )
    np.testing.assert_array_equal(out[0, 0], 0)  # no candidates
    np.testing.assert_allclose(out[0, 1], 1.0, rtol=1e-5)  # interpolated ones
