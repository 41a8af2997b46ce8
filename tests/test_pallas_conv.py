"""Oracle tests for the fused Pallas rulebook conv (interpret mode on CPU).

The kernel itself targets TPU (Mosaic dynamic_gather); these tests run the
same kernel logic through the Pallas interpreter against float64 numpy
references, covering window-walk correctness (multi-window tails, misses,
padding) and the dW kernel. TPU-compiled parity is exercised by
scratch/mb_conv.py and the bench.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lidarseg3d_tpu.ops import sparse as sp
from lidarseg3d_tpu.ops import pallas_conv as pc


def make_structure(V, grid, seed=0, density=0.3):
    rng = np.random.default_rng(seed)
    Z, Y, X = grid
    n = min(V - 7, int(Z * Y * X * density))  # leave padding rows
    keys = rng.choice(Z * Y * X, size=n, replace=False)
    keys.sort()
    z = keys // (Y * X)
    rem = keys % (Y * X)
    coords = np.stack([z, rem // X, rem % X], -1).astype(np.int32)
    pad = np.full((V - n, 3), -1, np.int32)
    coords = np.concatenate([coords, pad])[None]
    return sp.build_structure(
        jnp.asarray(coords), jnp.asarray(np.array([n], np.int32)), grid)


def kernel_rulebook(rb, V_in):
    g = np.asarray(rb)[:, 0, :]
    return jnp.asarray(np.where(g == V_in, pc.MISS, g).astype(np.int32))


def ref_conv(feats, gnp, W, V):
    ref = np.zeros((gnp.shape[1], W.shape[2]), np.float64)
    for k in range(gnp.shape[0]):
        idx = gnp[k]
        found = idx != int(pc.MISS)
        xk = np.where(found[:, None], feats[np.clip(idx, 0, V - 1)], 0)
        ref += xk.astype(np.float64) @ W[k].astype(np.float64)
    return ref


@pytest.mark.parametrize("density", [0.08, 0.5])
def test_forward_oracle(density):
    V, grid = 1024, (8, 16, 16)
    Cin, Cout = 16, 32
    s = make_structure(V, grid, density=density)
    rb = sp.build_subm_rulebook(s, 3)
    gidx = kernel_rulebook(rb, V)
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(V, Cin)).astype(np.float32)
    n = int(s.num_voxels[0])
    feats[n:] = 0
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1
    wmat = jnp.asarray(W.transpose(2, 0, 1).reshape(Cout, 27 * Cin))

    out = pc.rulebook_conv_block(jnp.asarray(feats.T), gidx, wmat, cout=Cout,
                                 interpret=True)
    ref = ref_conv(feats, np.asarray(gidx), W, V)
    np.testing.assert_allclose(np.asarray(out).T, ref, atol=2e-4)


def test_forward_with_forced_tails():
    """Scatter partner indices widely so multi-window tails are exercised."""
    V = 512
    Cin = Cout = 16
    K = 27
    rng = np.random.default_rng(3)
    # adversarial rulebook: random partners anywhere in the table + misses
    g = rng.integers(0, V, size=(K, V)).astype(np.int32)
    missm = rng.random((K, V)) < 0.3
    g[missm] = int(pc.MISS)
    gidx = jnp.asarray(g)
    feats = rng.normal(size=(V, Cin)).astype(np.float32)
    W = rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1
    wmat = jnp.asarray(W.transpose(2, 0, 1).reshape(Cout, K * Cin))
    meta = pc.build_kernel_meta(gidx, V)
    assert int(np.asarray(meta["ecnt"]).max()) > 0, "no tails exercised"
    out = pc.rulebook_conv_block(jnp.asarray(feats.T), gidx, wmat, cout=Cout,
                                 interpret=True)
    ref = ref_conv(feats, g, W, V)
    np.testing.assert_allclose(np.asarray(out).T, ref, atol=2e-4)


def test_dw_oracle():
    V, grid = 512, (8, 8, 8)
    Cin, Cout = 16, 16
    s = make_structure(V, grid, density=0.5)
    rb = sp.build_subm_rulebook(s, 3)
    gidx = kernel_rulebook(rb, V)
    gnp = np.asarray(gidx)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(V, Cin)).astype(np.float32)
    n = int(s.num_voxels[0])
    feats[n:] = 0
    g = rng.normal(size=(V, Cout)).astype(np.float32)
    g[n:] = 0

    dw_ref = np.zeros((27, Cin, Cout), np.float64)
    for k in range(27):
        idx = gnp[k]
        found = idx != int(pc.MISS)
        xk = np.where(found[:, None], feats[np.clip(idx, 0, V - 1)], 0)
        dw_ref[k] = xk.T.astype(np.float64) @ g.astype(np.float64)

    dw = pc.rulebook_conv_dw(jnp.asarray(feats.T), gidx, jnp.asarray(g),
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(dw).reshape(27, Cin, Cout), dw_ref, atol=2e-4)


def test_meta_consistency():
    """Window metadata covers every partner index exactly once."""
    V = 1024
    K = 27
    rng = np.random.default_rng(5)
    g = rng.integers(0, V, size=(K, V)).astype(np.int32)
    g[rng.random((K, V)) < 0.5] = int(pc.MISS)
    meta = pc.build_kernel_meta(jnp.asarray(g), V)
    gcode = np.asarray(meta["gcode"])
    epack = np.asarray(meta["epack"])
    ecnt = np.asarray(meta["ecnt"])
    nb = V // 128
    for b in range(nb):
        covered = np.zeros((K, V // 128 + 1), bool)
        for gi in range(9):
            code = gcode[gi, b]
            if code < 0:
                continue
            w0 = code & (pc._MAX_BLOCKS - 1)
            for t in range(3):
                covered[gi * 3 + t, w0:w0 + 2] = True
        for j in range(ecnt[b]):
            e = epack[b, j]
            tap = (e >> 27) & 31
            st = (e >> 13) & (pc._MAX_BLOCKS - 1)
            cnt = e & 8191
            covered[tap, st:st + cnt] = True
        for k in range(K):
            idx = g[k, b * 128:(b + 1) * 128]
            for v in idx[idx != int(pc.MISS)]:
                assert covered[k, v // 128], (b, k, v)


def test_fused_conv_batched_rows(monkeypatch):
    """B=2 fused_conv runs per-row kernel calls (VMEM/SMEM budgets) and
    must match the per-row numpy reference + sum dW across rows."""
    from lidarseg3d_tpu.ops import sparse_pallas as spz

    V, grid = 512, (8, 12, 12)
    Cin, Cout = 16, 8
    rng = np.random.default_rng(5)
    coords_rows, nums = [], []
    for seed in (1, 2):
        s = make_structure(V, grid, seed=seed, density=0.25)
        coords_rows.append(np.asarray(s.coords)[0])
        nums.append(int(s.num_voxels[0]))
    struct = sp.build_structure(
        jnp.asarray(np.stack(coords_rows)[None][0][None].repeat(1, 0)),
        jnp.asarray(np.array([nums[0]], np.int32)), grid)
    coords2 = jnp.asarray(np.stack(coords_rows))
    struct2 = sp.build_structure(
        coords2, jnp.asarray(np.array(nums, np.int32)), grid)
    rb = sp.build_subm_rulebook(struct2, 3)  # [27, 2, V], miss = 2*V

    feats = rng.normal(size=(2, V, Cin)).astype(np.float32)
    for b in (0, 1):
        feats[b, nums[b]:] = 0
    W = (rng.normal(size=(27, Cin, Cout)) * 0.1).astype(np.float32)

    def f(x, w):
        return spz.fused_conv(x, w, rb, mode="fp32", interpret=True)

    out = f(jnp.asarray(feats), jnp.asarray(W))
    assert out.shape == (2, V, Cout)

    # per-row reference on row-local indices
    g = np.asarray(rb)
    for b in (0, 1):
        g_b = np.where(g[:, b] == 2 * V, int(pc.MISS), g[:, b] - b * V)
        ref = ref_conv(feats[b], g_b, W, V)
        np.testing.assert_allclose(np.asarray(out)[b], ref, atol=2e-4,
                                   err_msg=f"row {b}")

    # dW sums over rows; dX rows stay independent
    def loss(x, w):
        return jnp.sum(f(x, w) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats),
                                            jnp.asarray(W))
    assert np.isfinite(np.asarray(gw)).all()
    gx0, gw0 = jax.grad(
        lambda x, w: jnp.sum(spz.fused_conv(
            x, w, jnp.asarray(np.where(g[:, :1] == 2 * V, V, g[:, :1])),
            mode="fp32", interpret=True) ** 2),
        argnums=(0, 1))(jnp.asarray(feats[:1]), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(gx)[0], np.asarray(gx0)[0],
                               rtol=1e-4, atol=1e-5)
