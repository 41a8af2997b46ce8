"""N-step training-dynamics parity body (run in a fresh subprocess with
JAX_ENABLE_X64=1 — x64 must be set before jax initializes, and the rest of
the suite runs fp32).

Trains the SAME tiny head (Linear(no bias) -> BN(momentum 0.01, eps 1e-3)
-> ReLU -> Linear, i.e. the reference's make_convcls_head shape,
point_seg_batchloss_head.py:64-75) in float64 under BOTH stacks:

torch oracle: fastai-semantics OptimWrapper step — grad clip 35, then
  p.data.mul_(1 - wd*lr) for EVERY param (true_wd + bn_wd=True,
  /root/reference/det3d/solver/fastai_optim.py:163-180), then
  torch.optim.Adam(betas=(mom_t, 0.99), eps=1e-8) with per-iteration
  OneCycle lr/mom (learning_schedules_fastai.py:77-97; the trainer calls
  lr_scheduler.step(global_step) BEFORE each optimizer step,
  torchie/trainer/trainer.py:403-407).

jax side: the production optimizer (solver/optim.build_one_cycle_optimizer)
  + ops/losses.cross_entropy + models/layers.{TorchLinear,MaskedBatchNorm},
  identical init (copied from torch) and identical batches.

Asserts the 20-step loss trajectories and final params agree to ~fp32-lr
rounding (the only intentional precision difference: one_cycle_lr_fn
evaluates the schedule in fp32).

Prints one JSON line with both trajectories on success.
"""

import json

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon; float64
# needs a real-fp64 backend
import jax.numpy as jnp
from flax import linen as nn

from lidarseg3d_tpu.models.layers import MaskedBatchNorm, TorchLinear
from lidarseg3d_tpu.ops.losses import cross_entropy
from lidarseg3d_tpu.solver.optim import build_one_cycle_optimizer

assert jax.config.read("jax_enable_x64"), "run with JAX_ENABLE_X64=1"

N, F, H, C = 256, 12, 32, 9
STEPS = 20
WD = 0.01
LR_MAX = 0.01
MOMS = (0.95, 0.85)
DIV, PCT = 10.0, 0.4
CLIP = 35.0
BN_EPS, BN_MOM = 1e-3, 0.01


def one_cycle_np(t, total):
    """Reference OneCycle lr/mom at integer step t (float64).

    Independent transcription of the schedule spec: cosine anneal low->max
    over the first pct_start fraction, max->low/1e4 after; mom anneals
    opposite (learning_schedules_fastai.py:77-97)."""

    def acos(a, b, pct):
        return b + (a - b) / 2.0 * (np.cos(np.pi * pct) + 1.0)

    low = LR_MAX / DIV
    split = PCT * total
    if t < split:
        lr = acos(low, LR_MAX, t / split)
        mom = acos(MOMS[0], MOMS[1], t / split)
    else:
        p = (t - split) / (total - split)
        lr = acos(LR_MAX, low / 1e4, p)
        mom = acos(MOMS[1], MOMS[0], p)
    return float(lr), float(mom)


class Head(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = TorchLinear(H, use_bias=False)(x)
        x = MaskedBatchNorm(eps=BN_EPS, momentum=BN_MOM)(x, train=train)
        x = jax.nn.relu(x)
        return TorchLinear(C, use_bias=True)(x)


def main():
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((3, N, F))
    w = rng.standard_normal((F,))
    ys = ((xs @ w > 0).astype(np.int64)
          + (np.abs(xs[..., 0]) > 1).astype(np.int64) * 2)
    ys[:, ::17] = 0  # ignore_index rows

    # ---- torch float64 oracle (fastai OptimWrapper semantics) ----
    tm = torch.nn.Sequential(
        torch.nn.Linear(F, H, bias=False),
        torch.nn.BatchNorm1d(H, eps=BN_EPS, momentum=BN_MOM),
        torch.nn.ReLU(),
        torch.nn.Linear(H, C, bias=True),
    ).double()
    init = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}

    opt = torch.optim.Adam(tm.parameters(), lr=0.0, betas=(MOMS[0], 0.99),
                           eps=1e-8)
    lossf = torch.nn.CrossEntropyLoss(ignore_index=0)
    t_losses = []
    for t in range(STEPS):
        lr, mom = one_cycle_np(t, STEPS)
        for g in opt.param_groups:
            g["lr"] = lr
            g["betas"] = (mom, 0.99)
        x = torch.tensor(xs[t % 3])
        y = torch.tensor(ys[t % 3])
        opt.zero_grad()
        loss = lossf(tm(x), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        with torch.no_grad():  # fastai true_wd (bn_wd=True): shrink EVERY
            for p in tm.parameters():  # param before the Adam step
                p.mul_(1 - WD * lr)
        opt.step()
        t_losses.append(float(loss))

    # ---- jax float64 with the production optimizer ----
    model = Head()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]))
    params = {
        "TorchLinear_0": {"kernel": jnp.asarray(init["0.weight"].T)},
        "MaskedBatchNorm_0": {"scale": jnp.asarray(init["1.weight"]),
                              "bias": jnp.asarray(init["1.bias"])},
        "TorchLinear_1": {"kernel": jnp.asarray(init["3.weight"].T),
                          "bias": jnp.asarray(init["3.bias"])},
    }
    assert (jax.tree.structure(params)
            == jax.tree.structure(jax.tree.map(lambda a: a,
                                               variables["params"])))
    stats = {"MaskedBatchNorm_0": {
        "mean": jnp.asarray(init["1.running_mean"]),
        "var": jnp.asarray(init["1.running_var"]),
    }}

    tx, _ = build_one_cycle_optimizer(
        dict(type="adam", wd=WD, fixed_wd=True),
        dict(lr_max=LR_MAX, moms=list(MOMS), div_factor=DIV, pct_start=PCT),
        total_steps=STEPS, grad_clip=CLIP,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, x, y):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            return cross_entropy(logits, y, ignore_index=0), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, mut["batch_stats"], opt_state, loss

    j_losses = []
    for t in range(STEPS):
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(xs[t % 3]),
            jnp.asarray(ys[t % 3].astype(np.int32)))
        j_losses.append(float(loss))

    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)
    np.testing.assert_allclose(
        j_losses, t_losses, rtol=1e-6, atol=1e-9,
        err_msg="loss trajectories diverge: optimizer/schedule/BN semantics "
                "drifted from the reference stack")

    # final params agree too (catches drift that cancels in the loss)
    fin = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    np.testing.assert_allclose(
        np.asarray(params["TorchLinear_0"]["kernel"]), fin["0.weight"].T,
        rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(params["TorchLinear_1"]["kernel"]), fin["3.weight"].T,
        rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(params["MaskedBatchNorm_0"]["scale"]), fin["1.weight"],
        rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(stats["MaskedBatchNorm_0"]["mean"]),
        fin["1.running_mean"], rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(stats["MaskedBatchNorm_0"]["var"]),
        fin["1.running_var"], rtol=1e-5, atol=1e-8)

    print(json.dumps({"torch": t_losses.tolist(), "jax": j_losses.tolist()}))


if __name__ == "__main__":
    main()
