"""Fused train-mode BatchNorm: one reduce pass forward, one backward.

Why: the profiler shows the flax/autodiff BatchNorm path dominating the
ResNet-50 train step — 27 ms/step (36%) of `convert_reduce_fusion` ops,
because mean and E[x^2] are separate reduces re-reading every activation,
and autodiff of the two-pass stats emits 3-4 more reduce passes per BN in
backward. The TPU-native fix is algebraic, not heroic: a variadic
`lax.reduce` computes (sum, sum(x^2)) in ONE HBM pass, and a custom VJP
emits exactly one variadic reduce pass (sum(dy), sum(dy*xhat)) plus one
fused elementwise pass for dx — the textbook BN gradient:

    dx = gamma * r * (dy - (sum(dy) + xhat * sum(dy*xhat)) / n)

Semantics match ``flax.linen.BatchNorm`` (biased variance, running stats
``ra = m * ra + (1-m) * batch``, f32 statistics, eps inside the rsqrt), so
``FusedBatchNorm`` is a drop-in for the backbones (same param/batch_stats
variable tree: scale/bias + mean/var). Reference behavior reproduced:
torch BatchNorm2d defaults inside resnet50 (models.py:16), eps 1e-5,
torch momentum 0.1 == flax/our momentum 0.9.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _sum_and(a: jnp.ndarray, b: jnp.ndarray):
    """One-pass variadic reduce of two same-shaped arrays over all but the
    last axis. XLA lowers this to a single fused kernel: one HBM read of
    the (fused) producers instead of two separate reduce passes."""
    dims = tuple(range(a.ndim - 1))
    zero = jnp.zeros((), jnp.float32)
    return lax.reduce(
        (a, b), (zero, zero),
        lambda acc, val: (acc[0] + val[0], acc[1] + val[1]),
        dims,
    )


def batch_stats_one_pass(x: jnp.ndarray):
    """(mean, var) over all but the channel axis, single HBM pass, f32."""
    xf = x.astype(jnp.float32)
    n = x.size // x.shape[-1]
    s, s2 = _sum_and(xf, xf * xf)
    mean = s / n
    var = s2 / n - mean * mean
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_apply(x, gamma, beta, eps):
    """Train-mode BN normalize. Returns (y, mean, var).

    mean/var are emitted for the running-stat update only; the module
    stop_gradients them (their cotangents are ignored in the VJP).
    """
    (y, mean, var), _ = _bn_fwd(x, gamma, beta, eps)
    return y, mean, var


def _bn_fwd(x, gamma, beta, eps):
    mean, var = batch_stats_one_pass(x)
    r = lax.rsqrt(var + eps)
    # scale-shift form: y = x*a + b with per-channel a, b. The big tensors
    # stay bf16 in HBM; only [C]-sized scalars are shared between passes,
    # so XLA fuses each pass's converts/FMAs into a single HBM sweep
    # (a shared f32 xhat intermediate would materialize 2x the bytes).
    a = r * gamma
    b = beta - mean * a
    y = (x.astype(jnp.float32) * a + b).astype(x.dtype)
    return (y, mean, var), (x, gamma, mean, r)


def _bn_bwd(eps, res, cts):
    dy, _, _ = cts  # mean/var outputs are stop_gradient'ed by the module
    x, gamma, mean, r = res
    n = x.size // x.shape[-1]
    inv_n = 1.0 / n
    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    # single variadic reduce pass over (dy, dy*xhat) with xhat inlined as
    # x*r - mean*r (per-channel scalars only; producers fuse into the reduce)
    mu_r = mean * r
    s1, s2 = _sum_and(dyf, dyf * (xf * r - mu_r))
    dgamma = s2
    dbeta = s1
    # one fused elementwise pass: dx = rg*dy + c2*x + c0
    rg = gamma * r
    c2 = -(rg * r) * (s2 * inv_n)
    c0 = -(rg * (s1 * inv_n)) - c2 * mean
    dx = (rg * dyf + c2 * xf + c0).astype(x.dtype)
    return dx, dgamma, dbeta


bn_train_apply.defvjp(_bn_fwd, _bn_bwd)


class FusedBatchNorm(nn.Module):
    """Drop-in for ``flax.linen.BatchNorm`` (the subset the backbones use)
    with the one-pass-fwd / one-pass-bwd train path above.

    Variable tree matches flax exactly: params ``scale``/``bias`` and
    batch_stats ``mean``/``var`` — torch porting (rxtpu.models.pretrained)
    and existing checkpoints are unaffected.

    NOT wired into production models: a measured dead end kept for fused-
    block experiments (OPTIMIZATION.md "Fused one-pass BatchNorm"). The
    backbones use ``rxtpu.models.norm.BatchNorm``, whose semantics differ
    deliberately (torch-exact UNBIASED running var, momentum 0.9 default
    vs flax's 0.99 here) — do not swap one for the other without porting
    those semantics.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        scale = self.param("scale", self.scale_init, (features,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (features,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (features,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (features,)
        )
        out_dtype = self.dtype or x.dtype

        if use_ra:
            r = lax.rsqrt(ra_var.value + self.epsilon)
            y = (x.astype(jnp.float32) - ra_mean.value) * (r * scale) + bias
            return y.astype(out_dtype)

        if self.axis_name is not None and not self.is_initializing():
            # cross-replica stats under shard_map/pmap: take the plain
            # autodiff path so gradients flow through the pmean'd stats.
            # (Under SPMD jit the fused path's reduce is already global.)
            mean, var = batch_stats_one_pass(x)
            # combine via E[x] / E[x^2]: pmean of per-replica variances
            # would drop the between-replica mean-spread term (equal-size
            # shards assumed, as everywhere under pmean)
            mean2 = var + jnp.square(mean)
            mean = lax.pmean(mean, self.axis_name)
            mean2 = lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            r = lax.rsqrt(var + self.epsilon)
            y = ((x.astype(jnp.float32) - mean) * (r * scale) + bias).astype(out_dtype)
        else:
            y, mean, var = bn_train_apply(x, scale, bias, self.epsilon)
        mean = lax.stop_gradient(mean)
        var = lax.stop_gradient(var)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        return y.astype(out_dtype)
