"""W8A8 post-training quantization modules for the inference path.

The bf16 eval forward runs AT its per-op composition ceiling
(OPTIMIZATION.md: 4034 views/s on v5e) — the remaining distance to the
BASELINE 5000-views/s north star needs a lever that moves the ceiling
itself. int8 does: the chip runs int8 MXU ops at 1.68x its bf16 matmul
rate (dev/int8_probe.py, 232.7 TOPS measured) and int8 activations/
weights halve HBM traffic. This module provides the drop-in conv
variants; calibration + weight quantization live in ``rxtpu.infer.quant``.

Semantics (symmetric, zero-point-free — conv zero padding stays exact):

  xq  = clip(round(x / in_scale), -127, 127)  int8   [per-tensor scale]
  y   = conv(xq, kernel_q)                    int32  [MXU int8 path]
  out = y * (in_scale * w_scale) + bias       f32    [w_scale per out-ch]

The forward keeps activations INT8-RESIDENT between convs: each conv's
epilogue (dequant + bias [+ residual] + relu + requantize-to-the-next-
conv's-scale) is one single-consumer elementwise chain off the s32 conv
output, which XLA fuses into ONE kernel writing int8 — no bf16 activation
ever materializes in HBM, residual branches read the int8 tensor
(dequantized in the consuming epilogue), and the stem maxpool runs on
int8 directly (monotone => exact). Measured on v5e (dev/hlo_traffic.py):
the earlier consumer-side-quantize design materialized bf16 block
outputs + standalone requantize kernels worth ~8 ms of HBM traffic per
96-view step. Quantizing the forward is jit-traceable (round/clip/scale),
so the predict step folds BN AND quantizes from the live train state on
the fly; only calibration (data-dependent ranges) runs ahead of time.

These modules are eval-only companions of the reference architecture
(cell_classifier/models.py:16-29 via the BN-folded form, rxtpu/infer/
fold.py); they change numerics (that is the point), so the path is opt-in
(``--quantize int8``) and accuracy-tested against the f32 forward.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _as_pair(v) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


class ObservedConv(nn.Conv):
    """nn.Conv that records its input's AND output's absmax into the
    ``qstats`` collection (max-reduced across calls/batches). Used with
    the BN-folded weight tree during calibration; parameter paths are
    identical to ``nn.Conv`` (it IS one). The output range feeds the
    projection convs' ``out_scale`` (their output is a residual branch —
    no consumer conv holds a calibrated scale for it).

    Scalar (per-tensor) AND per-channel absmax are both recorded: the
    densenet path quantizes activations per channel (trained
    pre-activation BNs leave concat states with strongly heterogeneous
    channel ranges — a per-tensor scale measured 67% int8-vs-bf16
    submission agreement on trained checkpoints; per-channel scales fold
    exactly into the consumer conv's quantized weights)."""

    @nn.compact
    def __call__(self, x):
        xa = jnp.abs(x.astype(jnp.float32))
        self.sow(
            "qstats", "in_absmax", jnp.max(xa),
            init_fn=lambda: jnp.float32(0.0),
            reduce_fn=lambda a, b: jnp.maximum(a, b),
        )
        self.sow(
            "qstats", "in_absmax_ch", jnp.max(xa, axis=tuple(range(xa.ndim - 1))),
            init_fn=lambda: jnp.zeros((x.shape[-1],), jnp.float32),
            reduce_fn=lambda a, b: jnp.maximum(a, b),
        )
        y = super().__call__(x)
        ya = jnp.abs(y.astype(jnp.float32))
        self.sow(
            "qstats", "out_absmax", jnp.max(ya),
            init_fn=lambda: jnp.float32(0.0),
            reduce_fn=lambda a, b: jnp.maximum(a, b),
        )
        self.sow(
            "qstats", "out_absmax_ch", jnp.max(ya, axis=tuple(range(ya.ndim - 1))),
            init_fn=lambda: jnp.zeros((self.features,), jnp.float32),
            reduce_fn=lambda a, b: jnp.maximum(a, b),
        )
        return y


class QuantConv(nn.Module):
    """int8 conv consuming a quantized weight tree (rxtpu.infer.quant).

    Field names/defaults mirror the ``nn.Conv`` subset the ResNet uses, so
    the backbone's ``conv`` partial can swap classes; ``use_bias`` /
    ``kernel_init`` are accepted for signature compatibility (bias always
    exists — it carries the folded BN shift).

    The call signature supports the int8-RESIDENT dataflow (see module
    docstring): ``x`` is either a bf16/f32 array (quantized here with the
    calibrated ``in_scale`` param) or an ``(int8 array, scale)`` pair a
    producer already quantized; ``relu_out`` folds the block's relu into
    this conv's epilogue; ``residual`` (array or pair) is added before the
    relu; ``out_scale`` requantizes the epilogue output and returns an
    ``(int8, out_scale)`` pair instead of a bf16 array — so between convs
    only int8 tensors hit HBM (the s32 conv output -> next int8 tensor is
    a single-consumer elementwise chain XLA fuses into ONE kernel).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Any = None  # unused: weights come from quantize_variables

    @nn.compact
    def __call__(self, x, out_scale=None, relu_out: bool = False,
                 residual=None):
        kh, kw = _as_pair(self.kernel_size)
        pre_quantized = isinstance(x, tuple)
        cin = (x[0] if pre_quantized else x).shape[-1]
        kq = self.param(
            "kernel_q",
            lambda _k, s: jnp.zeros(s, jnp.int8),
            (kh, kw, cin, self.features),
        )
        w_scale = self.param(
            "w_scale", lambda _k, s: jnp.ones(s, jnp.float32),
            (self.features,),
        )
        bias = self.param(
            "bias", lambda _k, s: jnp.zeros(s, jnp.float32),
            (self.features,),
        )
        in_scale = self.param(
            "in_scale", lambda _k, s: jnp.ones(s, jnp.float32), ())
        if pre_quantized:
            # producer quantized with the SAME calibration entry this
            # conv's in_scale came from; use the scale it actually used.
            # A VECTOR scale means per-input-channel quantization, which
            # is exact only because quantize_densenet_backbone baked that
            # vector into kernel_q (W' = W * s_in[i]); dequant then uses
            # w_scale alone.
            xq, in_scale = x
            if getattr(in_scale, "ndim", 0) == 1:
                in_scale = jnp.float32(1.0)
        elif x.dtype == jnp.int8:
            # quantize-at-source contract: a bare int8 input was produced
            # at THIS conv's calibrated in_scale (the Pallas crop-normalize
            # kernel reads the same in_scale param from the tree —
            # rxtpu/infer/quant._make_quantized_body)
            xq = x
        else:
            inv = (1.0 / in_scale).astype(jnp.float32)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * inv), -127, 127
            ).astype(jnp.int8)
        pad = self.padding
        if isinstance(pad, (list, tuple)):
            pad = [tuple(p) for p in pad]
        y = jax.lax.conv_general_dilated(
            xq, kq, _as_pair(self.strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (w_scale * in_scale) + bias
        if residual is not None:
            if isinstance(residual, tuple):
                rq, rs = residual
                out = out + rq.astype(jnp.float32) * rs
            else:
                out = out + residual.astype(jnp.float32)
        if relu_out:
            out = jnp.maximum(out, 0.0)
        if out_scale is not None:
            q = jnp.clip(
                jnp.round(out * (1.0 / out_scale).astype(jnp.float32)),
                -127, 127).astype(jnp.int8)
            return q, out_scale
        return out.astype(self.dtype)


def quantize_to(x, scale):
    """Quantize a float array to an ``(int8, scale)`` pair at a known
    calibrated scale (symmetric, zero-point-free)."""
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / scale).astype(jnp.float32)),
        -127, 127).astype(jnp.int8)
    return q, scale


class QuantPreNorm(nn.Module):
    """Pre-activation BN + relu [+ requantize] on an int8 concat state.

    DenseNet's BN PRECEDES its convs (densenet.py:26-31), so the resnet
    trick of folding BN into the conv weights is unavailable (the conv's
    zero padding must stay zero AFTER normalization — fold.py:22-23).
    Instead the eval-mode BN is kept as an explicit per-channel affine on
    the int8 state: with per-channel dequant scales ``svec`` (each concat
    segment was quantized per-tensor, so its scale is constant over its
    channels) the chain is

      z = relu(q * (svec * mul) + add);  zq = clip(round(z / out_scale))

    — a single-consumer elementwise chain reading int8 and writing int8
    that XLA fuses into one kernel. ``mul``/``add`` are the precomputed
    eval-BN affine (rxtpu.infer.quant quantize_densenet_backbone); the
    parameter scope reuses the eval model's BN name so the tree stays
    navigable. ``out_scale=None`` returns the f32 activations instead
    (the final pre-head norm)."""

    features: int

    @nn.compact
    def __call__(self, x, out_scale=None):
        q, svec = x
        mul = self.param(
            "mul", lambda _k, s: jnp.ones(s, jnp.float32), (self.features,))
        add = self.param(
            "add", lambda _k, s: jnp.zeros(s, jnp.float32), (self.features,))
        z = q.astype(jnp.float32) * (svec * mul) + add
        z = jnp.maximum(z, 0.0)
        if out_scale is None:
            return z
        zq = jnp.clip(
            jnp.round(z * (1.0 / out_scale).astype(jnp.float32)),
            -127, 127).astype(jnp.int8)
        return zq, out_scale


def quant_max_pool(x, window=(3, 3), strides=(2, 2),
                   padding=((1, 1), (1, 1))):
    """Max pool on an ``(int8, scale)`` pair. Quantization is monotone, so
    pooling the quantized tensor == quantizing the pooled tensor — and the
    int8 pool moves half the HBM bytes. Padding uses -128 (< any quantized
    value, which clips at -127), matching ``nn.max_pool``'s -inf pad."""
    q, s = x
    out = jax.lax.reduce_window(
        q, jnp.int8(-128), jax.lax.max,
        (1, *window, 1), (1, *strides, 1), ((0, 0), *padding, (0, 0)))
    return out, s
