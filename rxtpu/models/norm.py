"""BatchNorm with exact torch running-statistics semantics.

``torch.nn.BatchNorm2d/1d`` (the reference's normalization everywhere —
``cell_classifier/models.py:16,31-39`` via torchvision resnet50 + the MLP
head) normalizes the batch with the *biased* variance but stores the
*unbiased* (Bessel-corrected, ``n/(n-1)``) variance into ``running_var``.
Flax's ``nn.BatchNorm`` stores the biased one — a real accuracy drift at
eval time: for the head's BatchNorm1d at the reference batch size 16 the
running variance (and hence every eval-mode activation scale) is off by
``16/15``. This module reproduces torch's semantics exactly (batch
variance computed in the fast single-pass form — see the in-code note):

- train: normalize with biased batch var; update ``mean``/``var`` running
  stats with ``momentum`` (flax convention: ``new = m*old + (1-m)*batch``)
  using the UNBIASED var, reduced over all non-feature axes (and over
  ``axis_name`` replicas — SyncBN — when given; n counts global elements).
- eval: normalize with the stored running stats.

Parameter/variable names ('scale', 'bias' / 'mean', 'var') match
``nn.BatchNorm`` so checkpoints and the torch porters are unaffected.

The application is the folded affine ``y = x*mul + add`` with
``mul = scale*rsqrt(var+eps)`` and ``add = bias - mean*mul`` computed in
f32 on the C-element vectors and applied in ``dtype`` — algebraically
identical to flax's ``(x-mean)*scale*rsqrt(var+eps)+bias`` and the form
XLA's elementwise fusion wants (one fused multiply-add per element).
Cross-validated bit-for-bit against ``torch.nn.BatchNorm`` in
``tests/test_torch_parity.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    # NOTE: the class is named ``BatchNorm`` (not TorchBatchNorm) so flax
    # auto-naming keeps producing the ``BatchNorm_{i}`` tree keys that
    # checkpoints and the torch state_dict porters rely on.
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    # apply the train-mode normalization as the folded ``x*mul + add``
    # (the exact rounding form the fused Pallas bottleneck kernels use —
    # their parity tests set this) instead of the better-conditioned
    # default ``(x-mean)*mul + bias``
    folded_apply: bool = False

    @nn.compact
    def __call__(self, x):
        feature_shape = (x.shape[-1],)
        reduction_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", self.scale_init, feature_shape, self.param_dtype)
        bias = self.param("bias", self.bias_init, feature_shape, self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), feature_shape
        )

        # stats in f32 normally; promote to f64 when the input is f64
        # (cross-framework numerics probes, dev/parity_gradcheck.py --f64)
        stat_dtype = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(stat_dtype)
            # single fused pass: E[x] and E[x^2] reduce together. This is
            # the fast-variance form (same as flax's default): XLA fuses
            # both reduces into the producing conv (OPTIMIZATION.md), where
            # a two-pass torch/Welford variance would force a second full
            # activation read. Deliberate deviation from torch's kernel:
            # E[x^2]-E[x]^2 cancels for |mean| >> std, which BN-scale
            # activations don't approach; the cross-framework parity tests
            # bound the realized difference.
            mean = jnp.mean(xf, reduction_axes)
            mean2 = jnp.mean(jnp.square(xf), reduction_axes)
            n = 1
            for a in reduction_axes:
                n *= x.shape[a]
            if self.axis_name is not None and not self.is_initializing():
                # SyncBN: one concatenated pmean for both moments
                stacked = jax.lax.pmean(
                    jnp.concatenate([mean, mean2]), self.axis_name
                )
                mean, mean2 = jnp.split(stacked, 2)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # torch stores the UNBIASED variance (Bessel n/(n-1));
                # normalization below still uses the biased one
                unbiased = var * (n / jnp.maximum(n - 1, 1)).astype(stat_dtype)
                m = self.momentum
                # update in stat_dtype but store back at the leaves' own
                # dtype: an f64 probe input must not flip the batch_stats
                # pytree to f64 (that would retrace every jitted apply and
                # break checkpoint round-trips against f32-initialized trees)
                ra_mean.value = (
                    m * ra_mean.value.astype(stat_dtype) + (1.0 - m) * mean
                ).astype(ra_mean.value.dtype)
                ra_var.value = (
                    m * ra_var.value.astype(stat_dtype) + (1.0 - m) * unbiased
                ).astype(ra_var.value.dtype)

        dtype = self.dtype if self.dtype is not None else x.dtype
        mul = scale.astype(stat_dtype) * jax.lax.rsqrt(
            var.astype(stat_dtype) + self.epsilon)
        if self.folded_apply and not self.use_running_average:
            # fused-kernel rounding form: f32 affine, rounded only on the
            # output write (matches rxtpu.ops.fused_block's BN application)
            add = bias.astype(jnp.float32) - mean * mul
            return (x.astype(jnp.float32) * mul + add).astype(dtype)
        if self.use_running_average:
            # folded affine: one FMA per element, and the form conv-weight
            # folding consumes (rxtpu.infer.fold)
            add = bias.astype(jnp.float32) - mean * mul
            return x.astype(dtype) * mul.astype(dtype) + add.astype(dtype)
        # train: subtract-first like torch — the folded form rounds at
        # eps*|x| instead of eps*|x-mean|, which measurably compounds
        # across a deep net's train-mode BNs (tests/test_torch_parity.py)
        return (
            (x.astype(dtype) - mean.astype(dtype)) * mul.astype(dtype)
            + bias.astype(dtype)
        )


TorchBatchNorm = BatchNorm  # import-site name documenting the semantics
