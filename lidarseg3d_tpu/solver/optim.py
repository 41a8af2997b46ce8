"""Optimizer + LR schedules.

Reproduces the reference training stack
(/root/reference/det3d/torchie/apis/train.py:199-216 +
det3d/solver/fastai_optim.py + learning_schedules_fastai.py:77-97):
Adam(betas=(0.9, 0.99)) with fastai true (decoupled) weight decay applied to
ALL params (bn_wd=True), global-norm grad clip, and the OneCycle schedule
that cosine-anneals lr low->max->low/1e4 and beta1 0.95->0.85->0.95.
"""

import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr_fn(total_steps, lr_max, div_factor=10.0, pct_start=0.4):
    low_lr = lr_max / div_factor

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        split = pct_start * total_steps
        p1 = jnp.clip(step / jnp.maximum(split, 1.0), 0.0, 1.0)
        p2 = jnp.clip(
            (step - split) / jnp.maximum(total_steps - split, 1.0), 0.0, 1.0
        )
        up = annealing_cos(low_lr, lr_max, p1)
        down = annealing_cos(lr_max, low_lr / 1e4, p2)
        return jnp.where(step < split, up, down)

    return lr


def one_cycle_mom_fn(total_steps, moms=(0.95, 0.85), pct_start=0.4):
    def mom(step):
        step = jnp.asarray(step, jnp.float32)
        split = pct_start * total_steps
        p1 = jnp.clip(step / jnp.maximum(split, 1.0), 0.0, 1.0)
        p2 = jnp.clip(
            (step - split) / jnp.maximum(total_steps - split, 1.0), 0.0, 1.0
        )
        down = annealing_cos(moms[0], moms[1], p1)
        up = annealing_cos(moms[1], moms[0], p2)
        return jnp.where(step < split, down, up)

    return mom


def build_one_cycle_optimizer(optimizer_cfg, lr_cfg, total_steps, grad_clip=35.0):
    """cfg mirrors the reference config keys:
    optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True, ...)
    lr_config = dict(type="one_cycle", lr_max, moms, div_factor, pct_start)
    """
    assert optimizer_cfg.get("type", "adam") == "adam"
    wd = optimizer_cfg.get("wd", 0.0)
    lr_fn = one_cycle_lr_fn(
        total_steps,
        lr_cfg["lr_max"],
        lr_cfg.get("div_factor", 10.0),
        lr_cfg.get("pct_start", 0.4),
    )
    mom_fn = one_cycle_mom_fn(
        total_steps, tuple(lr_cfg.get("moms", (0.95, 0.85))),
        lr_cfg.get("pct_start", 0.4),
    )

    @optax.inject_hyperparams
    def make(learning_rate, b1):
        txs = []
        if grad_clip:
            txs.append(optax.clip_by_global_norm(grad_clip))
        txs.append(optax.scale_by_adam(b1=b1, b2=0.99, eps=1e-8))
        if wd:
            # fastai true_wd with bn_wd=True: decay every parameter
            txs.append(optax.add_decayed_weights(wd))
        txs.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*txs)

    return make(learning_rate=lr_fn, b1=mom_fn), lr_fn


def build_multistep_optimizer(optimizer_cfg, lr_cfg, total_steps, grad_clip=35.0):
    """Fallback path mirroring torch.optim + MultiStepLR configs."""
    base_lr = optimizer_cfg.get("lr", 1e-3)
    wd = optimizer_cfg.get("weight_decay", 0.0)
    milestones = lr_cfg.get("milestones", [])
    gamma = lr_cfg.get("gamma", 0.1)

    def lr_fn(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for m in milestones:
            lr = jnp.where(step >= m, lr * gamma, lr)
        return lr

    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if wd:
        txs.append(optax.add_decayed_weights(wd))
    txs.append(optax.scale_by_learning_rate(lr_fn))
    return optax.chain(*txs), lr_fn
