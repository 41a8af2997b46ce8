"""Dynamic voxelization + segment reductions vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from lidarseg3d_tpu.ops import dynamic_voxel as dv


def test_segment_ops_match_numpy():
    rng = np.random.default_rng(0)
    B, N, C = 2, 500, 4
    shape = (4, 8, 8)
    coords = rng.integers(0, 4, size=(B, N, 3)).astype(np.int32)
    coords[:, :, 1:] = rng.integers(0, 8, size=(B, N, 2))
    valid = rng.random((B, N)) > 0.1
    vals = rng.standard_normal((B, N, C)).astype(np.float32)
    cap = 300

    struct, p2v, found = dv.assign_points_to_voxels(
        jnp.asarray(coords), jnp.asarray(valid), shape, cap
    )
    p2v_np, found_np = np.asarray(p2v), np.asarray(found)
    assert (found_np == valid).all()

    mean = np.asarray(dv.segment_mean(jnp.asarray(vals), p2v, found, cap))
    mx = np.asarray(dv.segment_max(jnp.asarray(vals), p2v, found, cap))
    sc = np.asarray(struct.coords)
    nv = np.asarray(struct.num_voxels)

    for b in range(B):
        for j in range(nv[b]):
            members = valid[b] & (p2v_np[b] == j)
            assert members.any()
            np.testing.assert_allclose(
                mean[b, j], vals[b][members].mean(0), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                mx[b, j], vals[b][members].max(0), rtol=1e-5
            )
            # every member maps to the voxel whose coords match
            np.testing.assert_array_equal(
                coords[b][members][0], sc[b, j]
            )


def test_label_vote():
    rng = np.random.default_rng(1)
    B, N = 1, 300
    shape = (2, 4, 4)
    coords = np.stack([
        rng.integers(0, 2, N), rng.integers(0, 4, N), rng.integers(0, 4, N)
    ], 1).astype(np.int32)[None]
    valid = np.ones((B, N), bool)
    labels = rng.integers(0, 5, size=(B, N)).astype(np.int32)
    cap = 64
    struct, p2v, found = dv.assign_points_to_voxels(
        jnp.asarray(coords), jnp.asarray(valid), shape, cap
    )
    votes = np.asarray(
        dv.segment_label_vote(jnp.asarray(labels), p2v, found, cap, 5)
    )
    p2v_np = np.asarray(p2v)
    for j in range(int(struct.num_voxels[0])):
        members = labels[0][p2v_np[0] == j]
        counts = np.bincount(members, minlength=5)
        assert counts[votes[0, j]] == counts.max()


def test_cart2cylind_roundtrip():
    rng = np.random.default_rng(2)
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    cyl = np.asarray(dv.cart2cylind(jnp.asarray(xyz)))
    np.testing.assert_allclose(
        cyl[:, 0], np.hypot(xyz[:, 0], xyz[:, 1]), rtol=1e-5
    )
    np.testing.assert_allclose(
        cyl[:, 0] * np.cos(cyl[:, 1]), xyz[:, 0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(cyl[:, 2], xyz[:, 2])
