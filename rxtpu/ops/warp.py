"""Device-side fused geometric augmentation: flip + rotate + crop + normalize.

The reference augments on CPU workers with albumentations
(``cell_classifier/dataloader.py:42-51``): VerticalFlip(p=.5),
HorizontalFlip(p=.5), rotate by a uniform angle in [-180, 180] (p=1,
bilinear, reflect-101 border), RandomCrop 364; val/test center-crop 364;
then Normalize((x/255 - mean)/std) (``:134-137``).

TPU-first design: all four geometric ops compose into ONE inverse affine
map per view, so each output pixel is produced by a single bilinear gather
from the uint8 source plane — one pass over HBM, no intermediate rotated
image, no host augmentation. Normalization is fused into the same kernel
(XLA fuses the multiply-add into the gather consumer), output is bfloat16
NHWC ready for the conv stem.

Reproducibility: augmentation parameters are drawn from a counter-based
JAX PRNG key per (batch, view), so results are independent of pipeline
prefetch order and device count (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def reflect101(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 index fold: ...2 1 | 0 1 2 ... n-1 | n-2 n-3...

    Period is 2(size-1); valid for any integer index.
    """
    period = 2 * (size - 1)
    idx = jnp.abs(idx)
    idx = idx % period
    return jnp.where(idx >= size, period - idx, idx)


def sample_affine_params(
    key: jax.Array,
    n: int,
    src_size: int,
    crop_size: int,
    train: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw per-view augmentation parameters.

    Returns (angle_rad [n], vflip [n], hflip [n], crop_yx [n,2]).
    Train: uniform angle +-pi, bernoulli(0.5) flips, uniform crop offsets
    (dataloader.py:42-48). Eval: identity + center crop (dataloader.py:49-51).
    """
    if not train:
        c = (src_size - crop_size) // 2
        return (
            jnp.zeros((n,)),
            jnp.zeros((n,), jnp.bool_),
            jnp.zeros((n,), jnp.bool_),
            jnp.full((n, 2), c, jnp.int32),
        )
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jax.random.uniform(k1, (n,), minval=-jnp.pi, maxval=jnp.pi)
    vflip = jax.random.bernoulli(k2, 0.5, (n,))
    hflip = jax.random.bernoulli(k3, 0.5, (n,))
    crop = jax.random.randint(k4, (n, 2), 0, src_size - crop_size + 1)
    return angle, vflip, hflip, crop


def _warp_one(
    planes: jnp.ndarray,     # [C, H, W] uint8 source channel planes
    angle: jnp.ndarray,      # scalar rad
    vflip: jnp.ndarray,      # scalar bool
    hflip: jnp.ndarray,      # scalar bool
    crop_yx: jnp.ndarray,    # [2] int crop origin in rotated space
    mean: jnp.ndarray,       # [C] per-experiment channel mean (0..1 scale)
    std: jnp.ndarray,        # [C]
    crop_size: int,
    out_dtype,
) -> jnp.ndarray:
    """One view: inverse-map each crop pixel to the source and bilinear-sample.

    Composition (forward order flip -> rotate -> crop, dataloader.py:43-47)
    inverted: out pixel -> uncrop -> rotate by -angle about the image center
    -> unflip -> reflect101 fold -> gather.
    Returns [crop, crop, C] normalized, cast to out_dtype.
    """
    c_ch, h, w = planes.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (crop_size, crop_size), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (crop_size, crop_size), 1)
    # uncrop into rotated-image coordinates
    y = yy + crop_yx[0].astype(jnp.float32)
    x = xx + crop_yx[1].astype(jnp.float32)
    # rotate about center (inverse = rotate by -angle)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    yc, xc = y - cy, x - cx
    ys = cos * yc - sin * xc + cy
    xs = sin * yc + cos * xc + cx
    # unflip (flips are involutions)
    ys = jnp.where(vflip, (h - 1) - ys, ys)
    xs = jnp.where(hflip, (w - 1) - xs, xs)

    # bilinear sample with reflect101 border
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wy = ys - y0.astype(jnp.float32)
    wx = xs - x0.astype(jnp.float32)
    y0r = reflect101(y0, h)
    y1r = reflect101(y0 + 1, h)
    x0r = reflect101(x0, w)
    x1r = reflect101(x0 + 1, w)

    f = planes.astype(jnp.float32)  # [C,H,W]
    def gather(yi, xi):
        return f[:, yi, xi]  # [C, crop, crop] via broadcasted advanced indexing

    v00 = gather(y0r, x0r)
    v01 = gather(y0r, x1r)
    v10 = gather(y1r, x0r)
    v11 = gather(y1r, x1r)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy            # [C, crop, crop]
    # fused Normalize (dataloader.py:134-137): (x/255 - mean) / std
    scale = (1.0 / (255.0 * std)).astype(jnp.float32)
    bias = (-mean / std).astype(jnp.float32)
    out = out * scale[:, None, None] + bias[:, None, None]
    return jnp.transpose(out, (1, 2, 0)).astype(out_dtype)  # NHWC


@functools.partial(
    jax.jit, static_argnames=("crop_size", "train", "out_dtype")
)
def augment_batch(
    images: jnp.ndarray,   # uint8 [B, G, C, H, W] channel planes from the decoder
    mean: jnp.ndarray,     # f32 [B, C] per-sample experiment mean (0..1 scale)
    std: jnp.ndarray,      # f32 [B, C]
    key: jax.Array,
    crop_size: int = 364,
    train: bool = True,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Full fused augmentation for a batch of grouped views.

    Each (b, g) view draws independent parameters (each view gets its own
    ``_transform`` call in the reference, dataloader.py:153-173).
    Returns [B, G, crop, crop, C] normalized out_dtype (NHWC views).
    """
    b, g, c, h, w = images.shape
    # the crop-offset range and rotation center derive from h alone
    assert h == w, f"augment paths assume square sources, got {h}x{w}"
    n = b * g
    angle, vflip, hflip, crop = sample_affine_params(key, n, h, crop_size, train)
    flat = images.reshape(n, c, h, w)
    mean_v = jnp.repeat(mean, g, axis=0)  # [B*G, C]
    std_v = jnp.repeat(std, g, axis=0)
    warp = functools.partial(_warp_one, crop_size=crop_size, out_dtype=out_dtype)
    out = jax.vmap(warp)(flat, angle, vflip, hflip, crop, mean_v, std_v)
    return out.reshape(b, g, crop_size, crop_size, c)


def center_crop_normalize_reference(
    images: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray, crop_size: int,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """XLA (non-Pallas) eval path: center crop + normalize, for golden tests.

    images uint8 [B, G, C, H, W] -> [B, G, crop, crop, C].
    """
    b, g, c, h, w = images.shape
    o = (h - crop_size) // 2
    x = images[:, :, :, o : o + crop_size, o : o + crop_size].astype(jnp.float32)
    scale = (1.0 / (255.0 * std)).astype(jnp.float32)[:, None, :, None, None]
    bias = (-mean / std).astype(jnp.float32)[:, None, :, None, None]
    x = x * scale + bias
    return jnp.transpose(x, (0, 1, 3, 4, 2)).astype(out_dtype)
