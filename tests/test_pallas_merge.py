"""Sorted-keys merge-rank lookup (ops/pallas_merge.py + coords.KeyTable).

Checks that the dense-table-free KeyTable path returns EXACTLY the packed
rank/activity values of a materialized RankTable, standalone (kernel via
the Pallas interpreter, plus the XLA searchsorted oracle) and through all
three grouped rulebook builders (ops/sparse.py dispatch).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.ops import coords as co
from lidarseg3d_tpu.ops import pallas_merge as plm
from lidarseg3d_tpu.ops import sparse as sp


def _structure(rng, B, V, shape, nvox):
    zyx = np.stack(
        [rng.integers(0, s, size=(B, V)) for s in shape], axis=-1
    ).astype(np.int32)
    for b in range(B):
        keys = ((zyx[b, :, 0] * shape[1] + zyx[b, :, 1]) * shape[2]
                + zyx[b, :, 2])
        uniq = np.unique(keys)[: nvox[b]]
        nvox[b] = len(uniq)
        zyx[b, : nvox[b], 0] = uniq // (shape[1] * shape[2])
        zyx[b, : nvox[b], 1] = (uniq // shape[2]) % shape[1]
        zyx[b, : nvox[b], 2] = uniq % shape[2]
        zyx[b, nvox[b]:] = -1
    return sp.build_structure(
        jnp.asarray(zyx), jnp.asarray(nvox.astype(np.int32)), shape
    )


def _ranktable_packed_values(rt, cells):
    return np.asarray(jnp.take(rt.packed[0], jnp.asarray(cells), axis=0))


@pytest.mark.parametrize("mode", ["kernel", "xla"])
def test_merge_gather_matches_rank_table(mode):
    """Random sorted query streams over a random structure: packed values
    equal a RankTable gather exactly (rank + all three activity bits)."""
    rng = np.random.default_rng(0)
    shape = (5, 40, 50)  # nce_ext = 5*40*52 = 10400
    B, V = 1, 1024
    nvox = np.array([900])
    s = _structure(rng, B, V, shape, nvox)
    rt = co.build_rank_table(s.coords, s.num_voxels, shape)
    kt = co.build_key_table(s.coords, s.num_voxels, shape)
    nce = 5 * 40 * 52

    # mix of active cells, their neighbors, and uniform cells; sorted per
    # 1024-tile (three tiles with resets between them, like group streams)
    tiles = []
    for t in range(3):
        c = np.concatenate([
            rng.choice(nce, 512),
            np.clip(np.asarray(s.coords[0, :256, 0] * 40
                               + s.coords[0, :256, 1]) * 52
                    + np.asarray(s.coords[0, :256, 2]) + 1 + (t - 1), 0,
                    nce - 1),
            rng.choice(nce, 256),
        ])
        tiles.append(np.sort(c.astype(np.int32)))
    cells = jnp.asarray(np.concatenate(tiles))

    want = _ranktable_packed_values(rt, cells)
    if mode == "kernel":
        got = plm.merge_gather(kt.keys[0], kt.coarse[0], kt.shift, cells,
                               interpret=True)
    else:
        got = plm.merge_gather_xla(kt.keys[0], kt.num[0], cells)
    np.testing.assert_array_equal(want, np.asarray(got))


def test_merge_gather_dense_block():
    """A fully-active region (every cell in a block occupied) exercises
    multi-chunk rows and maximal in-chunk counts."""
    shape = (1, 8, 510)  # one y-row of 510 cells, ext row width 512
    V = 4096
    coords = np.full((1, V, 3), -1, np.int32)
    n = 8 * 510
    cells = np.arange(n)
    coords[0, :n, 0] = 0
    coords[0, :n, 1] = cells // 510
    coords[0, :n, 2] = cells % 510
    s = sp.build_structure(jnp.asarray(coords),
                           jnp.asarray(np.array([n], np.int32)), shape)
    rt = co.build_rank_table(s.coords, s.num_voxels, shape)
    kt = co.build_key_table(s.coords, s.num_voxels, shape)
    nce = 1 * 8 * 512
    q = np.sort(np.random.default_rng(1).choice(nce, 1024).astype(np.int32))
    want = _ranktable_packed_values(rt, q)
    got = plm.merge_gather(kt.keys[0], kt.coarse[0], kt.shift,
                           jnp.asarray(q), interpret=True)
    np.testing.assert_array_equal(want, np.asarray(got))


@pytest.mark.parametrize("builder", ["subm", "strided", "inverse"])
@pytest.mark.parametrize("path", ["xla", "kernel"])
def test_builders_keytable_matches_ranktable(monkeypatch, builder, path):
    """All three grouped rulebook builders produce identical rulebooks on
    the KeyTable path (both backends) and the RankTable path."""
    rng = np.random.default_rng(2)
    B, V, shape = 2, 512, (6, 24, 24)
    nvox = np.array([500, 301])
    s1 = _structure(rng, B, V, shape, nvox)
    rt1 = co.build_rank_table(s1.coords, s1.num_voxels, shape)
    kt1 = co.build_key_table(s1.coords, s1.num_voxels, shape)
    s2 = sp.downsample_structure(s1, 2, capacity=V // 2)
    rt2 = co.build_rank_table(s2.coords, s2.num_voxels, s2.spatial_shape)
    kt2 = co.build_key_table(s2.coords, s2.num_voxels, s2.spatial_shape)

    def build(t1, t2):
        if builder == "subm":
            return sp.build_subm_rulebook(s1, table=t1)
        if builder == "strided":
            return sp.build_strided_rulebook(s1, s2, 3, 2, 1, table=t1)
        return sp.build_inverse_rulebook(s2, s1, 3, 2, 1, table=t2)

    want = build(rt1, rt2)
    if path == "kernel":
        monkeypatch.setattr(sp, "_pallas_mode", lambda: "fp32i")
    got = build(kt1, kt2)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_lookup_key_matches_lookup_rank():
    rng = np.random.default_rng(3)
    B, V, shape = 2, 256, (4, 20, 30)
    nvox = np.array([200, 77])
    s = _structure(rng, B, V, shape, nvox)
    rt = co.build_rank_table(s.coords, s.num_voxels, shape)
    kt = co.build_key_table(s.coords, s.num_voxels, shape)
    q = jnp.asarray(
        rng.integers(-1, [[4, 20, 30]], size=(B, 300, 3)).astype(np.int32))
    iw, fw = co.lookup_rank(rt, q)
    ig, fg = co.lookup_key(kt, q)
    np.testing.assert_array_equal(np.asarray(fw), np.asarray(fg))
    np.testing.assert_array_equal(np.asarray(iw)[np.asarray(fw)],
                                  np.asarray(ig)[np.asarray(fg)])


def test_auto_table_kind_picks_keys_beyond_vmem_budget():
    from lidarseg3d_tpu.ops import pallas_lookup as plk

    small = sp.build_structure(
        jnp.zeros((1, 8, 3), jnp.int32), jnp.ones((1,), jnp.int32),
        (4, 16, 16))
    assert isinstance(sp.dense_table(small), co.RankTable)
    big_shape = (41, 1024, 1024)  # real nuScenes 0.1 m stage-1 grid
    assert not plk.supported(41 * 1024 * 1026)
    big = sp.build_structure(
        jnp.zeros((1, 8, 3), jnp.int32), jnp.ones((1,), jnp.int32),
        big_shape)
    assert isinstance(sp.dense_table(big), co.KeyTable)
