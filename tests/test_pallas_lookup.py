"""Pallas sorted-stream rank-table lookup kernel (ops/pallas_lookup.py).

Runs the kernel through the Pallas interpreter on CPU and checks exact
equivalence with the XLA element-gather path, both standalone and through
the rulebook builders' grouped dispatch (ops/sparse.py _gather_cells).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.ops import coords as co
from lidarseg3d_tpu.ops import pallas_lookup as plk
from lidarseg3d_tpu.ops import sparse as sp


def test_lookup_gather_matches_take():
    rng = np.random.default_rng(0)
    nce = 50_000  # not a multiple of 1024: exercises table padding
    table = jnp.asarray(rng.integers(0, 2**20, nce).astype(np.int32))
    cells = np.sort(rng.choice(nce, size=8192, replace=False))
    q = jnp.asarray(cells.astype(np.int32))
    want = jnp.take(table, q, axis=0)
    got = plk.lookup_gather(table, q, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_lookup_gather_wide_spans():
    # Sparse tail: consecutive queries hundreds of windows apart must still
    # resolve (per-row fori walks the whole [wstart, wstart+wcnt) range).
    rng = np.random.default_rng(1)
    nce = 400_000
    table = jnp.asarray(rng.integers(0, 2**20, nce).astype(np.int32))
    cells = np.sort(rng.choice(nce, size=1024, replace=False))
    q = jnp.asarray(cells.astype(np.int32))
    want = jnp.take(table, q, axis=0)
    got = plk.lookup_gather(table, q, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_lookup_gather_hbm_path():
    """Tables over the VMEM budget dispatch to the windowed-DMA variant,
    including rows whose spans cross the MAXW-window chunk size."""
    rng = np.random.default_rng(3)
    nce = plk.LOOKUP_VMEM_BUDGET // 4 + 70_000
    table = jnp.asarray(rng.integers(0, 2**20, nce).astype(np.int32))
    assert not plk.supported(nce)
    # dense tile-local stream (typical) + sparse stream (multi-chunk spans)
    for size in (8192, 1024):
        cells = np.sort(rng.choice(nce, size=size, replace=False))
        q = jnp.asarray(cells.astype(np.int32))
        want = jnp.take(table, q, axis=0)
        got = plk.lookup_gather(table, q, interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def _random_structure(rng, B, V, shape, nvox):
    zyx = np.stack(
        [rng.integers(0, s, size=(B, V)) for s in shape], axis=-1
    ).astype(np.int32)
    # key-sort valid prefix per sample, invalidate the suffix
    for b in range(B):
        keys = (zyx[b, :, 0] * shape[1] + zyx[b, :, 1]) * shape[2] + zyx[b, :, 2]
        uniq = np.unique(keys)[: nvox[b]]
        nvox[b] = len(uniq)
        zyx[b, : nvox[b], 0] = uniq // (shape[1] * shape[2])
        zyx[b, : nvox[b], 1] = (uniq // shape[2]) % shape[1]
        zyx[b, : nvox[b], 2] = uniq % shape[2]
        zyx[b, nvox[b]:] = -1
    return sp.build_structure(
        jnp.asarray(zyx), jnp.asarray(nvox.astype(np.int32)), shape
    )


@pytest.mark.parametrize("builder", ["subm", "strided", "inverse"])
def test_builders_kernel_path_matches_xla(monkeypatch, builder):
    """The grouped builders give identical rulebooks on the kernel path
    (interpret mode) and the XLA fallback, including the monotone clamp of
    invalid queries."""
    rng = np.random.default_rng(2)
    B, V, shape = 2, 512, (6, 24, 24)
    nvox = np.array([500, 301])
    s1 = _random_structure(rng, B, V, shape, nvox)
    t1 = co.build_rank_table(s1.coords, s1.num_voxels, shape)
    s2 = sp.downsample_structure(s1, 2, capacity=V // 2)
    t2 = co.build_rank_table(s2.coords, s2.num_voxels, s2.spatial_shape)

    def build():
        if builder == "subm":
            return sp.build_subm_rulebook(s1, table=t1)
        if builder == "strided":
            return sp.build_strided_rulebook(s1, s2, 3, 2, 1, table=t1)
        return sp.build_inverse_rulebook(s2, s1, 3, 2, 1, table=t2)

    want = build()  # CPU -> XLA fallback

    monkeypatch.setattr(sp, "_pallas_mode", lambda: "fp32")
    orig = plk.lookup_gather
    monkeypatch.setattr(
        plk, "lookup_gather", functools.partial(orig, interpret=True)
    )
    got = build()
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_pack_rank_table_kernel_matches_xla():
    """ops/pallas_rank.pack_rank_table (interpret mode) == the XLA blocked
    cumsum formulation, including block-boundary neighbor bits and the
    running rank carry across 8192-cell blocks."""
    import numpy as np
    import jax.numpy as jnp
    from lidarseg3d_tpu.ops import pallas_rank

    rng = np.random.default_rng(9)
    for nce in (8192, 8192 * 3, 8192 * 2 + 777):
        act = (rng.random(nce) < 0.02).astype(np.int8)
        # ensure boundary cells are exercised
        act[8191:8194] = 1
        act[0] = 1
        act[-1] = 1
        got = np.asarray(pallas_rank.pack_rank_table(
            jnp.asarray(act), interpret=True))
        a = act.astype(np.int64)
        rank = np.cumsum(a)
        am = np.concatenate([[0], a[:-1]])
        ap = np.concatenate([a[1:], [0]])
        want = (rank << 3) | (am << 2) | (a << 1) | ap
        np.testing.assert_array_equal(got, want.astype(np.int32),
                                      err_msg=f"nce={nce}")


def test_build_rank_table_pallas_path_matches_xla_path():
    import numpy as np
    import jax.numpy as jnp
    from lidarseg3d_tpu.ops import coords as co

    rng = np.random.default_rng(2)
    B, V, shape = 2, 300, (4, 48, 60)
    zyx = np.stack([rng.integers(0, s, (B, V)) for s in shape], -1).astype(
        np.int32)
    nv = np.array([260, 0], np.int32)
    c, n = jnp.asarray(zyx), jnp.asarray(nv)
    # dedupe per sample so ranks are well-defined
    cc, nn, _ = co.unique_coords(
        c, jnp.arange(V)[None] < n[:, None], shape, V)
    t_xla = co.build_rank_table(cc, nn, shape, use_pallas=False)
    from lidarseg3d_tpu.ops import pallas_rank
    orig = pallas_rank.pack_rank_table
    try:  # run the pallas path through the interpreter on CPU
        pallas_rank.pack_rank_table = (
            lambda act, interpret=False: orig(act, interpret=True))
        t_pal = co.build_rank_table(cc, nn, shape, use_pallas=True)
    finally:
        pallas_rank.pack_rank_table = orig
    np.testing.assert_array_equal(
        np.asarray(t_pal.packed), np.asarray(t_xla.packed))
