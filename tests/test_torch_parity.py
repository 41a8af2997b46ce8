"""Numerical parity against torch reference layers (torch-cpu available).

These pin the semantics that SURVEY.md §7.3 flags as mIoU-critical:
BatchNorm (momentum/eps/biased-vs-unbiased stats) and CrossEntropyLoss
ignore_index reduction.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from lidarseg3d_tpu.models.layers import MaskedBatchNorm
from lidarseg3d_tpu.ops import losses as L

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the default tier (VERDICT r4 item 3)



def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.default_rng(0)
    N, C = 400, 16
    x = rng.standard_normal((N, C)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(C, eps=1e-3, momentum=0.01)
    tbn.train()
    with torch.no_grad():
        t_out1 = tbn(torch.from_numpy(x)).numpy()
        t_out2 = tbn(torch.from_numpy(x * 2 + 1)).numpy()
    t_mean = tbn.running_mean.numpy().copy()
    t_var = tbn.running_var.numpy().copy()
    tbn.eval()
    with torch.no_grad():
        t_eval = tbn(torch.from_numpy(x)).numpy()

    bn = MaskedBatchNorm(eps=1e-3, momentum=0.01)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    j_out1, s1 = bn.apply(variables, jnp.asarray(x), train=True,
                          mutable=["batch_stats"])
    v2 = {"params": variables["params"], "batch_stats": s1["batch_stats"]}
    j_out2, s2 = bn.apply(v2, jnp.asarray(x * 2 + 1), train=True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(j_out1), t_out1, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_out2), t_out2, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2["batch_stats"]["mean"]), t_mean, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2["batch_stats"]["var"]), t_var, rtol=1e-4, atol=1e-6)

    v3 = {"params": variables["params"], "batch_stats": s2["batch_stats"]}
    j_eval = bn.apply(v3, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(j_eval), t_eval, rtol=1e-4,
                               atol=1e-5)


def test_masked_batchnorm_equals_torch_on_valid_slice():
    """BN over padded rows with a mask == torch BN over the valid slice."""
    rng = np.random.default_rng(1)
    N, pad, C = 300, 100, 8
    x = rng.standard_normal((N + pad, C)).astype(np.float32)
    mask = np.zeros(N + pad, bool)
    mask[:N] = True

    tbn = torch.nn.BatchNorm1d(C, eps=1e-5, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        t_out = tbn(torch.from_numpy(x[:N])).numpy()

    bn = MaskedBatchNorm(eps=1e-5, momentum=0.1)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        mask=jnp.asarray(mask), train=True)
    j_out, st = bn.apply(variables, jnp.asarray(x), mask=jnp.asarray(mask),
                         train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(j_out)[:N], t_out, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)


def test_cross_entropy_matches_torch_ignore_index():
    rng = np.random.default_rng(2)
    N, C = 500, 20
    logits = rng.standard_normal((N, C)).astype(np.float32)
    labels = rng.integers(0, C, N)
    t = torch.nn.CrossEntropyLoss(ignore_index=0)(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    j = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0))
    assert abs(t - j) < 1e-5


def test_lovasz_matches_torch_reference_impl():
    """Our masked Lovász == the reference torch implementation, transcribed."""
    import torch.nn.functional as F

    def torch_lovasz(probas, labels, ignore=0):
        valid = labels != ignore
        probas, labels = probas[valid], labels[valid]
        C = probas.size(1)
        losses = []
        for c in range(C):
            fg = (labels == c).float()
            if fg.sum() == 0:
                continue
            errors = (fg - probas[:, c]).abs()
            errors_sorted, perm = torch.sort(errors, 0, descending=True)
            fg_sorted = fg[perm]
            gts = fg_sorted.sum()
            inter = gts - fg_sorted.cumsum(0)
            union = gts + (1 - fg_sorted).cumsum(0)
            jac = 1.0 - inter / union
            jac[1:] = jac[1:] - jac[:-1]
            losses.append(torch.dot(errors_sorted, jac))
        return (sum(losses) / len(losses)).item()

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((400, 7)).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, 7, 400)
    t = torch_lovasz(torch.from_numpy(probas),
                     torch.from_numpy(labels.astype(np.int64)))
    j = float(L.lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels),
                               ignore=0))
    assert abs(t - j) < 1e-4
