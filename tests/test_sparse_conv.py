"""Sparse conv ops vs. dense-volume numpy oracles on tiny grids."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.ops import sparse as sp
from lidarseg3d_tpu.ops import coords as co


def make_random_sparse(rng, B, V_cap, shape, Cin, density=0.2):
    """Random active sites per sample, padded to V_cap (prefix-valid).

    Rows are KEY-SORTED like the production voxelizer/unique_coords output
    (required by the rank lookup table and the fused kernel's window
    locality)."""
    Z, Y, X = shape
    coords = np.full((B, V_cap, 3), -1, np.int32)
    feats = np.zeros((B, V_cap, Cin), np.float32)
    nums = np.zeros((B,), np.int32)
    dense = np.zeros((B, Z, Y, X, Cin), np.float32)
    for b in range(B):
        total = Z * Y * X
        n = min(V_cap, max(1, int(total * density)))
        lin = np.sort(rng.choice(total, size=n, replace=False))
        z, rem = lin // (Y * X), lin % (Y * X)
        y, x = rem // X, rem % X
        f = rng.standard_normal((n, Cin)).astype(np.float32)
        coords[b, :n] = np.stack([z, y, x], 1)
        feats[b, :n] = f
        nums[b] = n
        dense[b, z, y, x] = f
    return coords, feats, nums, dense


def dense_subm_oracle(dense, W, active_mask):
    """Dense conv (zero padding) evaluated at active sites only."""
    B, Z, Y, X, Cin = dense.shape
    K, _, Cout = W.shape
    k = round(K ** (1 / 3))
    out = np.zeros((B, Z, Y, X, Cout), np.float32)
    taps = [(a, b_, c) for a in range(k) for b_ in range(k) for c in range(k)]
    pad = k // 2
    for ki, (dz, dy, dx) in enumerate(taps):
        src = np.zeros_like(dense)
        z0, y0, x0 = dz - pad, dy - pad, dx - pad
        zs = slice(max(0, z0), min(Z, Z + z0))
        ys = slice(max(0, y0), min(Y, Y + y0))
        xs = slice(max(0, x0), min(X, X + x0))
        zd = slice(max(0, -z0), min(Z, Z - z0))
        yd = slice(max(0, -y0), min(Y, Y - y0))
        xd = slice(max(0, -x0), min(X, X - x0))
        src[:, zd, yd, xd] = dense[:, zs, ys, xs]
        out += src @ W[ki]
    return out * active_mask[..., None]


@pytest.fixture(params=["off", "fp32i"])
def pallas_mode(request):
    """Run the conv oracles on both the XLA gather path and the fused
    Pallas kernel (fp32, interpret mode on CPU)."""
    prev = sp.PALLAS_MODE
    sp.set_pallas_mode(request.param)
    yield request.param
    sp.set_pallas_mode(prev)


def test_subm_conv_matches_dense(pallas_mode):
    rng = np.random.default_rng(0)
    B, Vc, shape, Cin, Cout = 2, 64, (5, 6, 7), 4, 8
    coords, feats, nums, dense = make_random_sparse(rng, B, Vc, shape, Cin)
    W = rng.standard_normal((27, Cin, Cout)).astype(np.float32)

    st = sp.SparseTensor(
        structure=sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape),
        features=jnp.asarray(feats),
    )
    out = np.asarray(sp.subm_conv(st, jnp.asarray(W), kernel_size=3))

    active = np.zeros((B,) + shape, bool)
    for b in range(B):
        c = coords[b, : nums[b]]
        active[b, c[:, 0], c[:, 1], c[:, 2]] = True
    oracle = dense_subm_oracle(dense, W, active)
    for b in range(B):
        c = coords[b, : nums[b]]
        np.testing.assert_allclose(
            out[b, : nums[b]], oracle[b, c[:, 0], c[:, 1], c[:, 2]], rtol=1e-4, atol=1e-4
        )
    # padded rows must be exactly zero
    for b in range(B):
        np.testing.assert_array_equal(out[b, nums[b]:], 0)


def test_strided_conv_matches_dense(pallas_mode):
    rng = np.random.default_rng(1)
    B, Vc, shape, Cin, Cout = 2, 96, (6, 8, 8), 3, 5
    coords, feats, nums, dense = make_random_sparse(rng, B, Vc, shape, Cin, 0.3)
    W = rng.standard_normal((27, Cin, Cout)).astype(np.float32)

    st = sp.SparseTensor(
        structure=sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape),
        features=jnp.asarray(feats),
    )
    out_struct = sp.downsample_structure(st.structure, 2, capacity=Vc)
    rb = sp.build_strided_rulebook(st.structure, out_struct, 3, 2, 1)
    rb_t = sp.build_inverse_rulebook(out_struct, st.structure, 3, 2, 1)
    out = np.asarray(
        sp.strided_conv(st, out_struct, jnp.asarray(W), kernel_size=3,
                        stride=2, padding=1, rulebook=rb, rulebook_t=rb_t)
    )
    oc = np.asarray(out_struct.coords)
    on = np.asarray(out_struct.num_voxels)

    # expected output sites: unique(floor(active/2)), key-sorted
    for b in range(B):
        act = coords[b, : nums[b]] // 2
        keys = (act[:, 0] * ((shape[1] + 1) // 2) + act[:, 1]) * ((shape[2] + 1) // 2) + act[:, 2]
        uk = np.unique(keys)
        assert on[b] == len(uk)
        # value check: out[o] = sum_k W_k * dense[2o + k - 1]
        Z, Y, X = shape
        for j in range(on[b]):
            o = oc[b, j]
            expect = np.zeros(Cout, np.float32)
            ki = 0
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        iz, iy, ix = 2 * o[0] + dz - 1, 2 * o[1] + dy - 1, 2 * o[2] + dx - 1
                        if 0 <= iz < Z and 0 <= iy < Y and 0 <= ix < X:
                            expect += dense[b, iz, iy, ix] @ W[ki]
                        ki += 1
            np.testing.assert_allclose(out[b, j], expect, rtol=1e-4, atol=1e-4)


def test_inverse_conv_matches_oracle(pallas_mode):
    rng = np.random.default_rng(2)
    B, Vc, shape, C = 1, 80, (6, 6, 6), 4
    coords, feats, nums, dense = make_random_sparse(rng, B, Vc, shape, C, 0.3)
    W_down = rng.standard_normal((27, C, C)).astype(np.float32)
    W_inv = rng.standard_normal((27, C, C)).astype(np.float32)

    hi_struct = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape)
    st = sp.SparseTensor(structure=hi_struct, features=jnp.asarray(feats))
    lo_struct = sp.downsample_structure(hi_struct, 2, capacity=Vc)
    lo_feats = sp.strided_conv(st, lo_struct, jnp.asarray(W_down))
    st_lo = sp.SparseTensor(structure=lo_struct, features=lo_feats)

    rb = sp.build_inverse_rulebook(lo_struct, hi_struct, 3, 2, 1)
    rb_t = sp.build_strided_rulebook(hi_struct, lo_struct, 3, 2, 1)
    up = np.asarray(sp.inverse_conv(st_lo, hi_struct, jnp.asarray(W_inv),
                                    rulebook=rb, rulebook_t=rb_t))

    # oracle: dense low-res volume, target t gathers d=(t+1-k)/2 when exact
    lo_shape = lo_struct.spatial_shape
    lo_dense = np.zeros((B,) + lo_shape + (C,), np.float32)
    lc, ln = np.asarray(lo_struct.coords), np.asarray(lo_struct.num_voxels)
    lf = np.asarray(lo_feats)
    for b in range(B):
        for j in range(ln[b]):
            lo_dense[b, lc[b, j, 0], lc[b, j, 1], lc[b, j, 2]] = lf[b, j]
    for b in range(B):
        for j in range(nums[b]):
            t = coords[b, j]
            expect = np.zeros(C, np.float32)
            ki = 0
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        num = t + 1 - np.array([dz, dy, dx])
                        if np.all(num % 2 == 0):
                            d = num // 2
                            if np.all(d >= 0) and np.all(d < np.array(lo_shape)):
                                expect += lo_dense[b, d[0], d[1], d[2]] @ W_inv[ki]
                        ki += 1
            np.testing.assert_allclose(up[b, j], expect, rtol=1e-4, atol=1e-4)


def test_dense_lookup_roundtrip():
    rng = np.random.default_rng(5)
    shape = (9, 11, 13)
    coords, _, nums, _ = make_random_sparse(rng, 2, 50, shape, 1, 0.1)
    s = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape)
    table = co.build_dense_table(s.coords, s.num_voxels, shape)
    qkeys = co.make_query_keys(jnp.asarray(coords), shape)
    idx, found = co.lookup_dense(table, qkeys)
    idx, found = np.asarray(idx), np.asarray(found)
    for b in range(2):
        # every valid coord must find itself
        np.testing.assert_array_equal(idx[b, : nums[b]], np.arange(nums[b]))
        assert found[b, : nums[b]].all()
        # padded rows (coords=-1) must miss
        assert not found[b, nums[b]:].any()


def test_sorted_lookup_matches_dense():
    rng = np.random.default_rng(6)
    shape = (7, 9, 8)
    coords, _, nums, _ = make_random_sparse(rng, 2, 40, shape, 1, 0.15)
    cj, nj = jnp.asarray(coords), jnp.asarray(nums)
    s = sp.build_structure(cj, nj, shape)
    table = co.build_dense_table(cj, nj, shape)
    # arbitrary queries incl. misses and out-of-bounds
    q = jnp.asarray(rng.integers(-2, 9, size=(2, 100, 3)).astype(np.int32))
    qkeys = co.make_query_keys(q, shape)
    d_idx, d_found = co.lookup_dense(table, qkeys)
    sk, perm = co.build_hash_table(cj, nj, shape)
    s_idx, s_found = co.lookup(sk, perm, qkeys)
    np.testing.assert_array_equal(np.asarray(d_found), np.asarray(s_found))
    np.testing.assert_array_equal(
        np.where(np.asarray(d_found), np.asarray(d_idx), -7),
        np.where(np.asarray(s_found), np.asarray(s_idx), -7),
    )


def test_hash_map_matches_dense():
    """Open-addressing hash map == direct-address table on random queries
    (hits, misses, out-of-bounds, invalid), including forced collisions."""
    rng = np.random.default_rng(11)
    shape = (7, 9, 8)
    coords, _, nums, _ = make_random_sparse(rng, 2, 40, shape, 1, 0.35)
    cj, nj = jnp.asarray(coords), jnp.asarray(nums)
    s = sp.build_structure(cj, nj, shape)
    dense = co.build_dense_table(cj, nj, shape)
    # tiny slot count to force probe chains (load factor ~0.6)
    hmap = co.build_hash_map(cj, nj, shape, slots=64)
    q = jnp.asarray(rng.integers(-2, 10, size=(2, 200, 3)).astype(np.int32))
    qkeys = co.make_query_keys(q, shape)
    d_idx, d_found = co.lookup_dense(dense, qkeys)
    h_idx, h_found = co.lookup_hash(hmap, qkeys)
    np.testing.assert_array_equal(np.asarray(d_found), np.asarray(h_found))
    np.testing.assert_array_equal(
        np.where(np.asarray(d_found), np.asarray(d_idx), -7),
        np.where(np.asarray(h_found), np.asarray(h_idx), -7),
    )


@pytest.mark.parametrize("shape", [(6, 7, 8), (5, 9, 7)])
def test_rulebooks_all_table_kinds_agree(shape):
    """subm/strided/inverse rulebooks identical under dense, hash, and rank
    tables (the rank table's grouped one-gather-per-x-triple fast path, incl.
    odd x sizes, stride-1 inverse, and asymmetric kernels)."""
    rng = np.random.default_rng(12)
    coords, _, nums, _ = make_random_sparse(rng, 2, 96, shape, 1, 0.3)
    s = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape)
    out_s = sp.downsample_structure(s, 2, capacity=96)
    prev = sp.TABLE_KIND
    try:
        books = {}
        for kind in ("dense", "hash", "rank"):
            sp.set_table_kind(kind)
            books[kind] = [
                np.asarray(sp.build_subm_rulebook(s, 3)),
                np.asarray(sp.build_subm_rulebook(s, (1, 3, 3))),
                np.asarray(sp.build_subm_rulebook(s, (3, 1, 3))),
                np.asarray(sp.build_subm_rulebook(s, (3, 1, 1))),
                np.asarray(sp.build_strided_rulebook(s, out_s, 3, 2, 1)),
                np.asarray(sp.build_strided_rulebook(
                    s, out_s, 3, 2, (0, 1, 1))),
                np.asarray(sp.build_inverse_rulebook(out_s, s, 3, 2, 1)),
                np.asarray(sp.build_inverse_rulebook(
                    out_s, s, 3, 2, (0, 1, 1))),
                np.asarray(sp.build_inverse_rulebook(s, s, 3, 1, 1)),
            ]
    finally:
        sp.set_table_kind(prev)
    for i, (a, b) in enumerate(zip(books["dense"], books["hash"])):
        np.testing.assert_array_equal(a, b, err_msg=f"hash book {i}")
    for i, (a, b) in enumerate(zip(books["dense"], books["rank"])):
        np.testing.assert_array_equal(a, b, err_msg=f"rank book {i}")


def test_fused_conv_grads_match_xla():
    """custom_vjp of the fused kernel == autodiff of the XLA gather path
    (subm mirror-tap transpose AND strided/inverse pairing)."""
    rng = np.random.default_rng(7)
    B, Vc, shape, Cin, Cout = 1, 128, (6, 7, 8), 4, 6
    coords, feats, nums, _ = make_random_sparse(rng, B, Vc, shape, Cin, 0.3)
    st_struct = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape)
    out_struct = sp.downsample_structure(st_struct, 2, capacity=Vc)
    rb_s = sp.build_subm_rulebook(st_struct, 3)
    rb_d = sp.build_strided_rulebook(st_struct, out_struct, 3, 2, 1)
    rb_i = sp.build_inverse_rulebook(out_struct, st_struct, 3, 2, 1)
    # ~unit-gain weights: with std-1 weights each conv amplifies values (and
    # fp32 rounding deltas between the two mathematically equal paths) by
    # sqrt(27*Cin) ~ 10x per layer, which swamps any sane tolerance
    Ws = jnp.asarray(0.1 * rng.standard_normal((27, Cin, Cout)).astype(np.float32))
    Wd = jnp.asarray(0.1 * rng.standard_normal((27, Cout, Cout)).astype(np.float32))
    Wi = jnp.asarray(0.1 * rng.standard_normal((27, Cout, Cin)).astype(np.float32))
    x = jnp.asarray(feats)

    def net(x, Ws, Wd, Wi):
        st = sp.SparseTensor(structure=st_struct, features=x)
        a = sp.subm_conv(st, Ws, rulebook=rb_s)
        st2 = sp.SparseTensor(structure=st_struct, features=a)
        b = sp.strided_conv(st2, out_struct, Wd, rulebook=rb_d, rulebook_t=rb_i)
        st3 = sp.SparseTensor(structure=out_struct, features=b)
        c = sp.inverse_conv(st3, st_struct, Wi, rulebook=rb_i, rulebook_t=rb_d)
        return jnp.sum(jnp.sin(c))

    grad = jax.grad(net, argnums=(0, 1, 2, 3))
    prev = sp.PALLAS_MODE
    try:
        sp.set_pallas_mode("off")
        g_ref = grad(x, Ws, Wd, Wi)
        sp.set_pallas_mode("fp32i")
        g_fused = grad(x, Ws, Wd, Wi)
    finally:
        sp.set_pallas_mode(prev)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_union_output_sites_match_spconv_rule():
    """OUTPUT_SITES="union" reproduces spconv's receptive-field-union
    strided output sites (brute-force oracle), and is a superset of the
    default decimation sites."""
    rng = np.random.default_rng(21)
    shape = (6, 9, 7)
    coords, _, nums, _ = make_random_sparse(rng, 1, 64, shape, 1, 0.15)
    s = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), shape)
    for ks, st, pd in [(3, 2, 1), (3, 2, (0, 1, 1)), ((3, 1, 1), (2, 1, 1), 0)]:
        out_u = sp.downsample_structure(s, st, capacity=256, kernel_size=ks,
                                        padding=pd, rule="union")
        ks3, st3, pd3 = sp._triple(ks), sp._triple(st), sp._triple(pd)
        oshape = out_u.spatial_shape
        want = set()
        for i in np.asarray(coords)[0][: int(nums[0])]:
            for t in sp.make_offsets(ks3):
                o = [(int(i[d]) + pd3[d] - t[d]) for d in range(3)]
                if all(v % st3[d] == 0 for d, v in enumerate(o)):
                    o = [v // st3[d] for d, v in enumerate(o)]
                    if all(0 <= o[d] < oshape[d] for d in range(3)):
                        want.add(tuple(o))
        got = {
            tuple(c) for c in np.asarray(out_u.coords)[0][: int(out_u.num_voxels[0])]
        }
        assert got == want, (ks, st, pd)
        out_d = sp.downsample_structure(s, st, capacity=256)
        dec = {
            tuple(c) for c in np.asarray(out_d.coords)[0][: int(out_d.num_voxels[0])]
        }
        assert dec <= got


def test_fused_conv_column_chunking_matches():
    """SMEM-bounded column chunking (MAX_NB_PER_CALL) is exact: forward and
    grads equal the unchunked fused path."""
    from lidarseg3d_tpu.ops import sparse_pallas as spk

    rng = np.random.default_rng(9)
    B, Vc, shape, Cin, Cout = 2, 128, (6, 7, 8), 4, 6
    coords, feats, nums, _ = make_random_sparse(rng, B, Vc, shape, Cin, 0.3)
    st_struct = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums),
                                   shape)
    rb = sp.build_subm_rulebook(st_struct, 3)
    W = jnp.asarray(0.1 * rng.standard_normal((27, Cin, Cout)).astype(
        np.float32))
    x = jnp.asarray(feats)

    def f(x, W):
        return jnp.sum(jnp.sin(spk.fused_conv(x, W, rb, None, mode="fp32",
                                              interpret=True)))

    prev = spk.MAX_NB_PER_CALL
    try:
        spk.MAX_NB_PER_CALL = 4096
        ref_out = spk.fused_conv(x, W, rb, None, mode="fp32", interpret=True)
        ref_g = jax.grad(f, (0, 1))(x, W)
        spk.MAX_NB_PER_CALL = 1  # force one kernel call per 128-voxel block
        chk_out = spk.fused_conv(x, W, rb, None, mode="fp32", interpret=True)
        chk_g = jax.grad(f, (0, 1))(x, W)
    finally:
        spk.MAX_NB_PER_CALL = prev
    np.testing.assert_allclose(np.asarray(chk_out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(chk_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_unique_coords_dense_matches_sort():
    """The sort-free dense-compaction path of unique_coords (small grids)
    matches the jnp.unique sort path, including capacity overflow, empty
    samples, and key-sorted output order."""
    import numpy as np
    import jax.numpy as jnp
    from lidarseg3d_tpu.ops import coords as co

    rng = np.random.default_rng(7)
    B, V, shape = 3, 700, (6, 24, 24)
    zyx = np.stack([rng.integers(0, s, (B, V)) for s in shape], -1).astype(
        np.int32)
    valid = np.arange(V)[None, :] < np.array([650, 400, 0])[:, None]
    c, v = jnp.asarray(zyx), jnp.asarray(valid)
    saved = co.UNIQUE_DENSE_RATIO
    try:
        for cap in (256, 64):
            co.UNIQUE_DENSE_RATIO = 10**6  # force the dense path
            oc1, n1, k1 = co.unique_coords(c, v, shape, cap)
            co.UNIQUE_DENSE_RATIO = 0  # force the sort path
            oc2, n2, k2 = co.unique_coords(c, v, shape, cap)
            co.UNIQUE_DENSE_RATIO = saved
            np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
            np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
            np.testing.assert_array_equal(np.asarray(oc1), np.asarray(oc2))
    finally:
        co.UNIQUE_DENSE_RATIO = saved
