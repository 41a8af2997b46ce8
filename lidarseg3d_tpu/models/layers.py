"""Shared NN building blocks (Flax linen).

Initializers reproduce torch defaults so training dynamics match the
reference (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
for both Conv and Linear weights/biases).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_uniform_init(fan_in_fn):
    def init(key, shape, dtype=jnp.float32):
        fan_in = fan_in_fn(shape)
        bound = 1.0 / jnp.sqrt(jnp.asarray(float(fan_in)))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# Linear kernels are stored [in, out]
linear_kernel_init = torch_uniform_init(lambda s: s[0])
# Sparse conv kernels are stored [K, Cin, Cout]
conv_kernel_init = torch_uniform_init(lambda s: s[0] * s[1])


class TorchLinear(nn.Module):
    """nn.Linear with torch default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", linear_kernel_init, (in_f, self.features))
        # accumulate in >= fp32 (bf16 inputs accumulate fp32 on the MXU;
        # fp64 inputs — the train-parity oracle path — stay fp64)
        acc_t = jnp.promote_types(x.dtype, jnp.float32)
        y = jnp.einsum(
            "...c,co->...o", x, kernel, preferred_element_type=acc_t
        ).astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", torch_uniform_init(lambda s: in_f), (self.features,)
            )
            y = y + bias
        return y


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with validity masking and torch semantics.

    - statistics over masked entries of ALL leading dims; under pjit/jit SPMD
      the batch dim is global, so this IS SyncBatchNorm (reference converts
      models with torch.nn.SyncBatchNorm, apis/train.py:312-327).
    - torch momentum semantics: running = (1-m)*running + m*batch.
    - normalization uses biased batch var; running var stores unbiased.
    - sub_groups=G: input last dim is G*C interleaved copies of the SAME C
      channels (space-to-depth layout, img_backbones/hrnet.py); params and
      running stats stay per-C and batch statistics pool the G groups, so
      numerics equal the plain-layout BN exactly.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    sub_groups: int = 1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        if self.sub_groups > 1:
            G = self.sub_groups
            orig_shape = x.shape
            x = x.reshape(*x.shape[:-1], G, x.shape[-1] // G)
            if mask is not None:
                mask = jnp.broadcast_to(mask[..., None], x.shape[:-1])
        C = x.shape[-1]
        # statistics dtype: fp32 floor (bf16 activations use fp32 stats as
        # torch does), fp64 inputs (train-parity oracle) keep fp64
        sdt = jnp.promote_types(x.dtype, jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), sdt)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), sdt)
        )

        if train:
            xf = x.astype(sdt)
            if mask is None:
                mf = jnp.ones(x.shape[:-1], sdt)[..., None]
            else:
                mf = mask.astype(sdt)[..., None]
            cnt = jnp.maximum(jnp.sum(mf), 1.0)
            mean = jnp.sum(xf * mf, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum((xf - mean) ** 2 * mf, axis=tuple(range(x.ndim - 1))) / cnt
            )
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(sdt) - mean) * jax.lax.rsqrt(var + self.eps)
        y = (y * scale + bias).astype(x.dtype)
        if self.sub_groups > 1:
            y = y.reshape(orig_shape)
        return y


class MLPHead(nn.Module):
    """[Linear(no bias) + BN + ReLU] * len(fcs) + Linear(bias) — the
    reference's make_convcls_head (point_seg_batchloss_head.py:64-75)."""

    fcs: tuple
    out_features: int
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        for f in self.fcs:
            x = TorchLinear(f, use_bias=False)(x)
            x = MaskedBatchNorm(eps=self.bn_eps)(x, mask=mask, train=train)
            x = jax.nn.relu(x)
        return TorchLinear(self.out_features, use_bias=True)(x)
