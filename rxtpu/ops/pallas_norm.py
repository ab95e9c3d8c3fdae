"""Pallas TPU kernel: fused center-crop + dequantize + normalize + cast.

The eval/test data path (``dataloader.py:49-51,134-137``) is pure memory
movement: uint8 source plane -> crop 364x364 -> (x/255 - mean)/std ->
bfloat16. Done naively that is three HBM round trips (crop copy, float
normalize, cast). This kernel does it in ONE pass: each grid step DMAs one
512x512 uint8 channel plane into VMEM, applies the per-plane affine
(scale = 1/(255*std), bias = -mean/std) on the VPU, and writes only the
364x364 bfloat16 crop back to HBM.

Per-plane scale/bias ride in SMEM as (1,1) blocks (scalars must be 2D in
SMEM on TPU). Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _crop_norm_kernel(scale_ref, bias_ref, in_ref, out_ref, *, offset: int, crop: int):
    i = pl.program_id(0)
    scale = scale_ref[i]
    bias = bias_ref[i]
    block = in_ref[0, offset : offset + crop, offset : offset + crop]
    # Mosaic has no direct uint8->float cast; hop through int32.
    x = block.astype(jnp.int32).astype(jnp.float32) * scale + bias
    if out_ref.dtype == jnp.int8:
        # quantize-at-source for the W8A8 forward: the caller folded the
        # stem conv's calibrated 1/in_scale into scale/bias, so the
        # symmetric-int8 rounding (rxtpu/models/quant.py semantics) is
        # all that remains — the bf16 activation never exists
        x = jnp.clip(jnp.round(x), -127.0, 127.0)
    out_ref[0, :, :] = x.astype(out_ref.dtype)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit, static_argnames=("crop_size", "out_dtype", "interpret")
)
def crop_normalize(
    planes: jnp.ndarray,    # uint8 [N, H, W] channel planes
    scale: jnp.ndarray,     # f32 [N] multiplier (1 / (255 * std))
    bias: jnp.ndarray,      # f32 [N] offset (-mean / std)
    crop_size: int = 364,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused crop+normalize: returns [N, crop, crop] out_dtype planes."""
    n, h, w = planes.shape
    offset = (h - crop_size) // 2
    if interpret is None:
        interpret = not _on_tpu()
    kernel = functools.partial(_crop_norm_kernel, offset=offset, crop=crop_size)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [N] scale vector
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [N] bias vector
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, crop_size, crop_size), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, crop_size, crop_size), out_dtype),
        interpret=interpret,
    )(scale.astype(jnp.float32), bias.astype(jnp.float32), planes)


def eval_batch_normalize(
    images: jnp.ndarray,   # uint8 [B, G, C, H, W]
    mean: jnp.ndarray,     # f32 [B, C] per-sample experiment mean (0..1 scale)
    std: jnp.ndarray,      # f32 [B, C]
    crop_size: Optional[int] = 364,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    quant_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Eval/test batch path through the Pallas kernel.

    Returns NHWC views [B, G, crop, crop, C] (same contract as
    ``rxtpu.ops.warp.augment_batch`` with train=False). ``crop_size=None``
    skips the crop (normalize only — the reference's TEST-mode transform,
    dataloader.py:128-139, which crops for train/val but not test).

    ``quant_scale`` (scalar, traced ok): emit int8 views quantized at
    that scale — symmetric round/clip, the exact quantization the W8A8
    stem conv would apply (rxtpu/models/quant.py) — fused into this same
    single pass. Kills the bf16 view write + read + separate quantize
    kernel on the int8 predict path.
    """
    b, g, c, h, w = images.shape
    assert h == w, f"augment paths assume square sources, got {h}x{w}"
    if crop_size is None:
        crop_size = h
    planes = images.reshape(b * g * c, h, w)
    scale = (1.0 / (255.0 * std)).astype(jnp.float32)
    bias = (-mean / std).astype(jnp.float32)
    if quant_scale is not None:
        inv = 1.0 / quant_scale.astype(jnp.float32)
        scale = scale * inv
        bias = bias * inv
        out_dtype = jnp.int8
    scale = jnp.repeat(scale[:, None, :], g, axis=1).reshape(-1)
    bias = jnp.repeat(bias[:, None, :], g, axis=1).reshape(-1)
    out = crop_normalize(planes, scale, bias, crop_size, out_dtype, interpret)
    out = out.reshape(b, g, c, crop_size, crop_size)
    return jnp.transpose(out, (0, 1, 3, 4, 2))
