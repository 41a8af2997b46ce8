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
