"""Flax wrapper for the fused Pallas bottleneck block.

Drop-in train-mode replacement for ``rxtpu.models.resnet.BottleneckBlock``
(the flax counterpart of torchvision's Bottleneck, reference
``cell_classifier/models.py:16``): the parameter and batch_stats trees are
bit-identical to the standard block's (``Conv_0/BatchNorm_0/...`` plus
``conv_proj``/``norm_proj``), so checkpoints, pretrained porting
(rxtpu.models.pretrained) and freeze masks (rxtpu.train.optim) work
unchanged whether a stage was run fused or composed.

``ResNet(fuse_blocks=True)`` substitutes this module for every stride-1
bottleneck during training; eval and strided blocks keep the standard
composition (XLA already folds eval-BN into the convs).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rxtpu.ops.fused_block import (
    DEFAULT_SLAB_TARGET, bottleneck_fused, pad_pixels, plan_block)


class _ConvKernel(nn.Module):
    """Param holder producing exactly nn.Conv's {kernel} entry."""

    shape: Tuple[int, ...]  # [kh, kw, in, out]
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        return self.param("kernel", init, self.shape, self.param_dtype)


class _BNVars(nn.Module):
    """Param/stat holder producing exactly nn.BatchNorm's entries."""

    features: int
    zero_scale: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        scale_init = (
            nn.initializers.zeros if self.zero_scale else nn.initializers.ones
        )
        scale = self.param(
            "scale", scale_init, (self.features,), self.param_dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,))
        var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,))
        return scale, bias, mean, var


class FusedBottleneckBlock(nn.Module):
    """Train-mode 1x1-3x3-1x1 bottleneck via rxtpu.ops.fused_block."""

    filters: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5
    interpret: Optional[bool] = None
    # pixels per Pallas grid step; when fed pre-flattened input the caller
    # must have padded with the SAME slab_target (ResNet passes its value)
    slab_target: int = DEFAULT_SLAB_TARGET
    # spatial dims, required when fed pre-flattened padded [N, PP, C] input
    # (stage chaining: ResNet pads once per run of fused blocks)
    height: Optional[int] = None
    width: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        if self.strides != (1, 1):
            raise ValueError("fused bottleneck supports stride 1 only")
        nhwc = x.ndim == 4
        if nhwc:
            N, H, W, C = x.shape
        else:
            N, _, C = x.shape
            H, W = self.height, self.width
            assert H is not None and W is not None, (
                "flat input needs height/width attrs")
        F = self.filters
        C4 = 4 * F
        proj = C != C4

        w1 = _ConvKernel((1, 1, C, F), self.param_dtype, name="Conv_0")()
        g1, b1, rm1, rv1 = _BNVars(
            F, param_dtype=self.param_dtype, name="BatchNorm_0")()
        w2 = _ConvKernel((3, 3, F, F), self.param_dtype, name="Conv_1")()
        g2, b2, rm2, rv2 = _BNVars(
            F, param_dtype=self.param_dtype, name="BatchNorm_1")()
        w3 = _ConvKernel((1, 1, F, C4), self.param_dtype, name="Conv_2")()
        g3, b3, rm3, rv3 = _BNVars(
            C4, zero_scale=True, param_dtype=self.param_dtype,
            name="BatchNorm_2")()
        if proj:
            wp = _ConvKernel(
                (1, 1, C, C4), self.param_dtype, name="conv_proj")()
            gp, bp, rmp, rvp = _BNVars(
                C4, param_dtype=self.param_dtype, name="norm_proj")()

        cfg = plan_block(
            H, W, F, C, eps=self.epsilon, proj=proj, interpret=self.interpret,
            slab_target=self.slab_target)

        if self.is_initializing():
            # params/stats above fully define the tree; skip the kernels
            shape = (N, H, W, C4) if nhwc else (N, cfg.padded, C4)
            return jnp.zeros(shape, self.dtype)

        params = {
            "w1": w1.reshape(C, F),
            "w2": w2.reshape(9, F, F),  # [ky,kx] row-major == _OFFSETS order
            "w3": w3.reshape(F, C4),
            "g1": g1, "b1": b1, "g2": g2, "b2": b2, "g3": g3, "b3": b3,
        }
        if proj:
            params.update(wp=wp.reshape(C, C4), gp=gp, bp=bp)

        if nhwc:
            xf = pad_pixels(
                x.astype(jnp.bfloat16).reshape(N, H * W, C), cfg)
        else:
            xf = x.astype(jnp.bfloat16)
        y, stats = bottleneck_fused(cfg, xf, params)

        if self.is_mutable_collection("batch_stats"):
            m = self.momentum
            # torch running_var stores the UNBIASED variance (Bessel
            # n/(n-1) over the true, unpadded element count) — keep the
            # fused path consistent with rxtpu.models.norm.BatchNorm
            n = N * H * W
            bessel = n / max(n - 1, 1)
            for (rm, rv), key in (
                ((rm1, rv1), "bn1"), ((rm2, rv2), "bn2"), ((rm3, rv3), "bn3"),
            ) + ((((rmp, rvp), "bnp"),) if proj else ()):
                bmean, bvar = stats[key]
                rm.value = m * rm.value + (1.0 - m) * bmean
                rv.value = m * rv.value + (1.0 - m) * (bessel * bvar)

        if nhwc:
            return y[:, :H * W, :].reshape(N, H, W, C4).astype(self.dtype)
        return y.astype(self.dtype)
