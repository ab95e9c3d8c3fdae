"""Fused eval-mode ResNet stem: crop+normalize+conv7x7s2+bias/relu+maxpool.

The reference eval/test path runs, per view (``dataloader.py:49-51`` +
torchvision resnet50 stem, ``models.py:16``):

    uint8 512^2x6 -> center-crop 364 -> (x/255-mean)/std -> conv7x7/2
    (zero pad 3) -> BN (affine at eval) -> relu -> maxpool3x3/2 (pad 1)

As separate XLA ops that is ~4 HBM round trips over the largest
activations in the network (the 364^2 normalize write+read and the
182^2x64 conv output write+read) plus a 6-input-channel conv that leaves
most MXU lanes idle. This kernel does the whole chain in ONE pass per
view.

Mosaic cannot lower strided vector slices, so the stride-2 structure is
prepared OUTSIDE the kernel: the padded crop window is deinterleaved
mod 4 by XLA (16 sub-planes per channel — pure layout work the uint8
read fuses into). Inside the kernel every conv tap and every pool tap
then becomes a UNIT-stride static slice:

- normalize the 16 sub-planes on the VPU (per-sample scale/bias from
  SMEM) with a static iota validity mask so the conv's zero padding
  stays exactly zero (the reference pads the cropped image AFTER
  normalization),
- for each output parity (row, col) in {even,odd}^2: build the 294-deep
  im2col stack (7x7x6 taps, unit-stride slices of the mod-4 planes) and
  run ONE bf16 [294,64] x [294,Po,Po] matmul with f32 accumulation — the
  6-channel conv becomes a K=294 contraction that fills the MXU,
- bias (the folded eval-BN affine: rxtpu.infer.fold) + relu,
- the 3x3/2 max-pool combines the four parity outputs with -inf-edge
  shifts (pool row 2p-1/2p/2p+1 = odd[p-1], even[p], odd[p] — unit
  stride again),
- write only the [64, Po, Po] pooled bf16 result to HBM.

Eval-mode only (BN folded); the train path keeps the XLA stem (train BN
needs batch moments of the conv output — a two-pass structure round 2
measured into a dead end, OPTIMIZATION.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # -inf stand-in for maxpool borders (f32 finite)
_PAD = 3        # conv7x7 zero padding


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def stem_out_size(crop: int) -> int:
    conv = (crop + 2 * _PAD - 7) // 2 + 1
    pool = (conv + 2 * 1 - 3) // 2 + 1
    return pool


def _stem_kernel(scale_ref, bias_ref, w_ref, cb_ref, img_ref, out_ref, *,
                 crop: int, n_ch: int, sub: int, mm_dtype=jnp.bfloat16):
    i = pl.program_id(0)
    conv_o = (crop + 2 * _PAD - 7) // 2 + 1
    pool_o = (conv_o + 1) // 2
    half = conv_o // 2          # odd-parity conv rows/cols count

    # ---- normalize the mod-4 sub-planes; static validity mask ------------
    # padded-image coordinate of sub-plane (a, b) element (k, l) is
    # (4k + a, 4l + b); image pixels live at [_PAD, _PAD + crop)
    # lane-block: tap windows are padded to 128 columns so the rank-3 ->
    # rank-2 flatten around the MXU dot is tile-aligned (Mosaic rejects
    # shape casts that split a non-128-aligned lane dim)
    lane = 128
    wide = max(sub, ((6 + 2) // 4) + lane)  # >= max col offset + lane block
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (1, sub, wide), 1)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (1, sub, wide), 2)
    planes = {}
    for c in range(n_ch):
        sc = scale_ref[i, c]
        bs = bias_ref[i, c]
        for a in range(4):
            for b in range(4):
                p = img_ref[0, c, a * 4 + b:a * 4 + b + 1, :, :]  # [1,sub,sub]
                x = p.astype(jnp.int32).astype(jnp.float32) * sc + bs
                if wide > sub:
                    x = jnp.concatenate(
                        [x, jnp.zeros((1, sub, wide - sub), jnp.float32)],
                        axis=2)
                rr = 4 * rows_i + a
                cc = 4 * cols_i + b
                valid = ((rr >= _PAD) & (rr < _PAD + crop)
                         & (cc >= _PAD) & (cc < _PAD + crop))
                planes[(c, a, b)] = jnp.where(valid, x, 0.0).astype(mm_dtype)

    # ---- conv per output parity: unit-stride im2col + one matmul ---------
    w = w_ref[...].astype(mm_dtype)

    def conv_parity(pr: int, pc: int, n_r: int, n_c: int):
        taps = []
        for c in range(n_ch):
            for ky in range(7):
                for kx in range(7):
                    a = (ky + 2 * pr) % 4
                    ro = (ky + 2 * pr) // 4
                    b = (kx + 2 * pc) % 4
                    co = (kx + 2 * pc) // 4
                    taps.append(jax.lax.slice(
                        planes[(c, a, b)], (0, ro, co),
                        (1, ro + n_r, co + lane)))
        patches = jnp.concatenate(taps, axis=0)          # [294, n_r, 128]
        patches = patches.reshape(n_ch * 49, n_r * lane)  # tile-aligned
        # canonical [M, K] x [K, N] MXU form (transposed-lhs contraction
        # over sublanes takes a slow Mosaic path)
        out = jax.lax.dot_general(
            w, patches, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out.reshape(out.shape[0], n_r, lane)[:, :, :n_c]
        return jnp.maximum(out + cb_ref[...], 0.0)

    n_even_r, n_odd_r = pool_o, half          # even rows 2q: q<=pool_o-1
    cee = conv_parity(0, 0, n_even_r, n_even_r)
    ceo = conv_parity(0, 1, n_even_r, n_odd_r)
    coe = conv_parity(1, 0, n_odd_r, n_even_r)
    coo = conv_parity(1, 1, n_odd_r, n_odd_r)

    # ---- maxpool 3x3/2 pad 1: combine parities with -inf shifts ----------
    m = cee.shape[0]

    def shift_r(x):  # odd-row stack indexed at p-1: prepend -inf row
        neg = jnp.full((m, 1, x.shape[2]), _NEG, jnp.float32)
        return jnp.concatenate([neg, x], axis=1)[:, :pool_o, :]

    def shift_c(x):
        neg = jnp.full((m, x.shape[1], 1), _NEG, jnp.float32)
        return jnp.concatenate([neg, x], axis=2)[:, :, :pool_o]

    def fit(x):  # pad odd stacks (half rows/cols) up to pool_o at the end
        r_short = pool_o - x.shape[1]
        c_short = pool_o - x.shape[2]
        if r_short:
            x = jnp.concatenate(
                [x, jnp.full((m, r_short, x.shape[2]), _NEG, jnp.float32)],
                axis=1)
        if c_short:
            x = jnp.concatenate(
                [x, jnp.full((m, x.shape[1], c_short), _NEG, jnp.float32)],
                axis=2)
        return x

    pooled = cee  # [m, pool_o, pool_o]: r=2p, x=2s tap
    # col neighbors x = 2s-1, 2s+1 (odd stack at s-1, s)
    pooled = jnp.maximum(pooled, fit(shift_c(ceo)))
    pooled = jnp.maximum(pooled, fit(ceo))
    # row neighbors r = 2p-1, 2p+1 (odd stack at p-1, p)
    pooled = jnp.maximum(pooled, fit(shift_r(coe)))
    pooled = jnp.maximum(pooled, fit(coe))
    # diagonal neighbors
    pooled = jnp.maximum(pooled, fit(shift_r(shift_c(coo))))
    pooled = jnp.maximum(pooled, fit(shift_r(coo)))
    pooled = jnp.maximum(pooled, fit(shift_c(coo)))
    pooled = jnp.maximum(pooled, fit(coo))

    out_ref[0, :, :, :] = pooled.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("crop_size", "out_dtype", "interpret", "vmem_mb"),
)
def fused_stem(
    images: jnp.ndarray,   # uint8 [N, C, H, W] raw source planes
    scale: jnp.ndarray,    # f32 [N, C]  1/(255*std)
    bias: jnp.ndarray,     # f32 [N, C]  -mean/std
    weights: jnp.ndarray,  # [7, 7, C, M] folded conv kernel (HWIO)
    conv_bias: jnp.ndarray,  # f32 [M] folded eval-BN shift
    crop_size: Optional[int] = 364,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    vmem_mb: int = 100,
) -> jnp.ndarray:
    """Returns [N, M, Po, Po] pooled stem output (NCHW; the caller
    transposes to NHWC, which XLA folds into the next conv ~free —
    dev/nchw_stem_probe.py)."""
    n, c, h, w_in = images.shape
    crop = crop_size or h
    offset = (h - crop) // 2
    m = weights.shape[-1]
    pool_o = stem_out_size(crop)
    if interpret is None:
        interpret = not _on_tpu()

    # XLA-side prep: crop, zero-pad 3, round up to a multiple of 4, and
    # deinterleave mod 4 (both dims). Pure uint8 layout work.
    side = crop + 2 * _PAD
    side4 = -(-side // 4) * 4
    sub = side4 // 4
    x = images[:, :, offset:offset + crop, offset:offset + crop]
    xp = jnp.pad(x, ((0, 0), (0, 0), (_PAD, side4 - side + _PAD),
                     (_PAD, side4 - side + _PAD)))
    x4 = jnp.stack(
        [xp[:, :, a::4, b::4] for a in range(4) for b in range(4)], axis=2)

    # [7,7,C,M] -> [M, C*7*7] matching the (c, ky, kx) tap order above
    w2 = jnp.transpose(weights, (2, 0, 1, 3)).reshape(c * 49, m).T
    kernel = functools.partial(
        _stem_kernel, crop=crop, n_ch=c, sub=sub,
        # interpret mode executes on CPU XLA, which cannot lower a
        # bf16 x bf16 = f32 dot; operands are bf16-ROUNDED either way,
        # only the multiply dtype differs
        mm_dtype=jnp.float32 if interpret else jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scale [N, C]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bias [N, C]
            pl.BlockSpec((m, c * 49), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # weights (constant)
            pl.BlockSpec((m, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # conv bias (constant)
            pl.BlockSpec((1, c, 16, sub, sub), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m, pool_o, pool_o), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m, pool_o, pool_o), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(scale.astype(jnp.float32), bias.astype(jnp.float32),
      w2.astype(jnp.bfloat16),
      conv_bias.astype(jnp.float32).reshape(m, 1, 1), x4)
    return out


def reference_stem(images, scale, bias, weights, conv_bias,
                   crop_size=364):
    """XLA reference for parity tests: same math, op by op."""
    n, c, h, w = images.shape
    crop = crop_size or h
    off = (h - crop) // 2
    x = images[:, :, off:off + crop, off:off + crop].astype(jnp.float32)
    x = x * scale[:, :, None, None] + bias[:, :, None, None]
    x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
    # bf16-round the inputs but run the conv in f32: same rounding model
    # as the kernel's bf16 matmul with f32 accumulation, and avoids CPU
    # XLA's unsupported bf16xbf16=f32 conv lowering
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16).astype(jnp.float32),
        weights.astype(jnp.bfloat16).astype(jnp.float32), (2, 2),
        [(_PAD, _PAD), (_PAD, _PAD)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, weights.shape, ("NHWC", "HWIO", "NHWC")))
    y = jnp.maximum(y + conv_bias[None, None, None, :], 0.0)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=_NEG)
    po = stem_out_size(crop)
    out = None
    for py in range(3):
        for px in range(3):
            tap = jax.lax.slice(
                yp, (0, py, px, 0),
                (n, py + 2 * po - 1, px + 2 * po - 1, y.shape[-1]),
                (1, 2, 2, 1))
            out = tap if out is None else jnp.maximum(out, tap)
    return jnp.transpose(out, (0, 3, 1, 2))  # NCHW to match fused_stem
