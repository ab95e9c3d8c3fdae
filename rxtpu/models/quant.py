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

The quantize step fuses into the previous op's epilogue and the dequant
into the conv's own epilogue, so the tensors that actually hit HBM are
int8. Quantizing the forward is jit-traceable (round/clip/scale), so the
predict step folds BN AND quantizes from the live train state on the fly;
only calibration (data-dependent activation ranges) runs ahead of time.

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
    """nn.Conv that records its input's absmax into the ``qstats``
    collection (max-reduced across calls/batches). Used with the BN-folded
    weight tree during calibration; parameter paths are identical to
    ``nn.Conv`` (it IS one)."""

    @nn.compact
    def __call__(self, x):
        self.sow(
            "qstats", "in_absmax",
            jnp.max(jnp.abs(x.astype(jnp.float32))),
            init_fn=lambda: jnp.float32(0.0),
            reduce_fn=lambda a, b: jnp.maximum(a, b),
        )
        return super().__call__(x)


class QuantConv(nn.Module):
    """int8 conv consuming a quantized weight tree (rxtpu.infer.quant).

    Field names/defaults mirror the ``nn.Conv`` subset the ResNet uses, so
    the backbone's ``conv`` partial can swap classes; ``use_bias`` /
    ``kernel_init`` are accepted for signature compatibility (bias always
    exists — it carries the folded BN shift).
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
    def __call__(self, x):
        kh, kw = _as_pair(self.kernel_size)
        cin = x.shape[-1]
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
        return out.astype(self.dtype)
