"""Lovász-softmax and masked CE vs. numpy transcriptions of the reference
algorithm (det3d/core/utils/loss_utils.py:217-330)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.ops import losses as L


def oracle_lovasz(probas, labels, ignore=None):
    valid = np.ones(len(labels), bool) if ignore is None else labels != ignore
    probas, labels = probas[valid], labels[valid]
    if probas.size == 0:
        return 0.0
    C = probas.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probas[:, c])
        perm = np.argsort(-errors, kind="stable")
        errors_s, fg_s = errors[perm], fg[perm]
        gts = fg_s.sum()
        inter = gts - np.cumsum(fg_s)
        union = gts + np.cumsum(1 - fg_s)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append(np.dot(errors_s, jac))
    return float(np.mean(losses)) if losses else 0.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lovasz_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    N, C = 400, 6
    logits = rng.standard_normal((N, C)).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, C, size=N)
    got = float(L.lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels), ignore=0))
    want = oracle_lovasz(probas.astype(np.float64), labels, ignore=0)
    assert abs(got - want) < 1e-4


def test_lovasz_padding_equivalence():
    """Loss over padded arrays (valid mask) == loss over the valid slice."""
    rng = np.random.default_rng(3)
    N, C, pad = 300, 5, 120
    logits = rng.standard_normal((N + pad, C)).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, C, size=N + pad)
    valid = np.zeros(N + pad, bool)
    valid[:N] = True
    labels[~valid] = 0  # padding carries ignore label too

    full = float(
        L.lovasz_softmax(
            jnp.asarray(probas), jnp.asarray(labels), ignore=0,
            valid=jnp.asarray(valid),
        )
    )
    sliced = float(
        L.lovasz_softmax(jnp.asarray(probas[:N]), jnp.asarray(labels[:N]), ignore=0)
    )
    assert abs(full - sliced) < 1e-5


def test_cross_entropy_matches_torch_semantics():
    rng = np.random.default_rng(4)
    N, C = 500, 7
    logits = rng.standard_normal((N, C)).astype(np.float32)
    labels = rng.integers(0, C, size=N)
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0))
    # numpy oracle
    keep = labels != 0
    lp = logits - logits.max(1, keepdims=True)
    lsm = lp - np.log(np.exp(lp).sum(1, keepdims=True))
    want = float(-lsm[np.arange(N), labels][keep].mean())
    assert abs(got - want) < 1e-5


def test_lovasz_gradient_flows():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((50, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, size=50))

    def f(lg):
        return L.lovasz_softmax(jax.nn.softmax(lg, -1), labels, ignore=0)

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
