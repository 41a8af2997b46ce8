"""PointNet++ ops vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from lidarseg3d_tpu.ops import pointnet2 as P


def test_fps_spreads_points():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
    valid = np.ones(200, bool)
    valid[150:] = False
    idx = np.asarray(P.furthest_point_sample(jnp.asarray(xyz),
                                             jnp.asarray(valid), 16))
    assert len(set(idx.tolist())) == 16  # distinct
    assert (idx < 150).all()  # never picks padding
    # greedy-furthest property: each new point is the argmax of min-dist
    chosen = [int(idx[0])]
    mind = np.full(200, np.inf)
    mind[~valid] = -np.inf
    for k in range(1, 16):
        d = np.sum((xyz - xyz[chosen[-1]]) ** 2, 1)
        mind = np.minimum(mind, np.where(valid, d, -np.inf))
        expect = int(np.argmax(mind))
        assert int(idx[k]) == expect
        chosen.append(expect)


def test_ball_query_matches_numpy():
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    valid = np.ones(300, bool)
    valid[280:] = False
    centers = rng.uniform(-5, 5, (10, 3)).astype(np.float32)
    r, K = 2.0, 8
    idx, cnt = P.ball_query(jnp.asarray(centers), jnp.asarray(xyz),
                            jnp.asarray(valid), r, K)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for m in range(10):
        d2 = np.sum((xyz - centers[m]) ** 2, 1)
        hits = np.nonzero((d2 < r * r) & valid)[0]
        want = hits[:K]
        assert cnt[m] == min(len(hits), K)
        np.testing.assert_array_equal(idx[m, : len(want)], want)
        if len(want) and len(want) < K:  # padding repeats first hit
            assert (idx[m, len(want):] == want[0]).all()


def test_group_points():
    rng = np.random.default_rng(2)
    f = rng.standard_normal((50, 4)).astype(np.float32)
    idx = rng.integers(0, 50, (7, 3)).astype(np.int32)
    out = np.asarray(P.group_points(jnp.asarray(f), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, f[idx])
