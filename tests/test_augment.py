"""Augmentation op tests: golden values vs numpy/cv2 semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.ops import (
    augment_batch,
    center_crop_normalize_reference,
    crop_normalize,
    eval_batch_normalize,
    reflect101,
    sample_affine_params,
)

SRC, CROP = 64, 48


def _batch(b=2, g=3, c=6, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, size=(b, g, c, SRC, SRC), dtype=np.uint8)
    mean = rng.uniform(0.2, 0.8, size=(b, c)).astype(np.float32)
    std = rng.uniform(0.1, 0.5, size=(b, c)).astype(np.float32)
    return images, mean, std


def test_reflect101_matches_opencv():
    import cv2

    n = 16
    idx = np.arange(-20, 36)
    got = np.asarray(reflect101(jnp.asarray(idx), n))
    want = np.array([cv2.borderInterpolate(int(i), n, cv2.BORDER_REFLECT_101) for i in idx])
    np.testing.assert_array_equal(got, want)


def test_pallas_crop_normalize_matches_xla():
    images, mean, std = _batch()
    got = eval_batch_normalize(jnp.asarray(images), jnp.asarray(mean), jnp.asarray(std), CROP)
    want = center_crop_normalize_reference(
        jnp.asarray(images), jnp.asarray(mean), jnp.asarray(std), CROP
    )
    assert got.shape == (2, 3, CROP, CROP, 6)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_crop_normalize_against_numpy():
    # golden check of the Pallas kernel math: (x/255 - mean)/std on the center crop
    images, mean, std = _batch(b=1, g=1, c=2)
    planes = images.reshape(2, SRC, SRC)
    scale = 1.0 / (255.0 * std[0, :2])
    bias = -mean[0, :2] / std[0, :2]
    out = crop_normalize(
        jnp.asarray(planes), jnp.asarray(scale), jnp.asarray(bias), CROP,
        out_dtype=jnp.float32,
    )
    o = (SRC - CROP) // 2
    want = planes[:, o : o + CROP, o : o + CROP].astype(np.float32)
    want = want * scale[:, None, None] + bias[:, None, None]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


def test_pallas_crop_normalize_quantize_at_source():
    # int8 emission (W8A8 quantize-at-source): the kernel's single pass
    # must equal quantize(bf16-normalize(x)) with the stem conv's
    # symmetric round/clip semantics (rxtpu/models/quant.py).
    images, mean, std = _batch()
    qs = jnp.float32(0.0375)
    got = eval_batch_normalize(
        jnp.asarray(images), jnp.asarray(mean), jnp.asarray(std), CROP,
        quant_scale=qs,
    )
    assert got.dtype == jnp.int8
    ref = eval_batch_normalize(
        jnp.asarray(images), jnp.asarray(mean), jnp.asarray(std), CROP,
        out_dtype=jnp.float32,
    )
    want = np.clip(np.round(np.asarray(ref) / float(qs)), -127, 127)
    # the fused path scales BEFORE rounding in f32 (no bf16 intermediate),
    # so values landing exactly on .5 after the bf16 round-trip may differ
    # by 1 code; everything else must match exactly
    diff = np.abs(np.asarray(got, np.int32) - want.astype(np.int32))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.99


def test_eval_params_are_identity_centercrop():
    angle, vflip, hflip, crop = sample_affine_params(
        jax.random.PRNGKey(0), 5, SRC, CROP, train=False
    )
    assert not np.asarray(vflip).any() and not np.asarray(hflip).any()
    np.testing.assert_array_equal(np.asarray(angle), 0.0)
    np.testing.assert_array_equal(np.asarray(crop), (SRC - CROP) // 2)


def test_augment_eval_equals_pallas_path():
    images, mean, std = _batch()
    a = augment_batch(
        jnp.asarray(images), jnp.asarray(mean), jnp.asarray(std),
        jax.random.PRNGKey(0), crop_size=CROP, train=False, out_dtype=jnp.float32,
    )
    b = eval_batch_normalize(
        jnp.asarray(images), jnp.asarray(mean), jnp.asarray(std), CROP,
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_augment_train_deterministic_per_key():
    images, mean, std = _batch()
    args = (jnp.asarray(images), jnp.asarray(mean), jnp.asarray(std))
    a = augment_batch(*args, jax.random.PRNGKey(7), crop_size=CROP, train=True)
    b = augment_batch(*args, jax.random.PRNGKey(7), crop_size=CROP, train=True)
    c = augment_batch(*args, jax.random.PRNGKey(8), crop_size=CROP, train=True)
    np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
    assert not np.array_equal(np.asarray(a, np.float32), np.asarray(c, np.float32))


def test_rotation_90deg_is_exact():
    """Rotation by exactly 90 deg has integral coordinates -> exact array rot."""
    from rxtpu.ops.warp import _warp_one

    rng = np.random.default_rng(0)
    plane = rng.integers(0, 256, size=(1, SRC, SRC), dtype=np.uint8)
    out = _warp_one(
        jnp.asarray(plane),
        jnp.asarray(np.pi / 2),
        jnp.asarray(False), jnp.asarray(False),
        jnp.zeros(2, jnp.int32),
        jnp.zeros(1), jnp.ones(1),
        crop_size=SRC, out_dtype=jnp.float32,
    )
    got = np.asarray(out)[..., 0] * 255.0
    # inverse map with theta=+pi/2: out(y,x) = src(cy - (x-cx), cx + (y-cy))
    want = np.rot90(plane[0].astype(np.float32), k=-1)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_flip_only_matches_numpy():
    from rxtpu.ops.warp import _warp_one

    rng = np.random.default_rng(1)
    plane = rng.integers(0, 256, size=(2, SRC, SRC), dtype=np.uint8)
    out = _warp_one(
        jnp.asarray(plane),
        jnp.asarray(0.0),
        jnp.asarray(True), jnp.asarray(False),   # vertical flip only
        jnp.full(2, (SRC - CROP) // 2, jnp.int32),
        jnp.zeros(2), jnp.ones(2),
        crop_size=CROP, out_dtype=jnp.float32,
    )
    o = (SRC - CROP) // 2
    want = plane[:, ::-1, :][:, o : o + CROP, o : o + CROP].astype(np.float32) / 255.0
    got = np.moveaxis(np.asarray(out), 2, 0)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_rotate_roundtrip_recovers_center():
    """Warping by theta then -theta approximately recovers a smooth image."""
    from rxtpu.ops.warp import _warp_one

    yy, xx = np.mgrid[0:SRC, 0:SRC].astype(np.float32)
    smooth = (127 + 90 * np.sin(yy / 9.0) * np.cos(xx / 11.0)).astype(np.uint8)
    plane = smooth[None]
    theta = 0.7

    def warp(p, t):
        return _warp_one(
            jnp.asarray(p), jnp.asarray(t),
            jnp.asarray(False), jnp.asarray(False),
            jnp.zeros(2, jnp.int32), jnp.zeros(1), jnp.ones(1),
            crop_size=SRC, out_dtype=jnp.float32,
        )

    once = np.asarray(warp(plane, theta))[..., 0]
    once_u8 = np.clip(once * 255.0, 0, 255).astype(np.uint8)[None]
    back = np.asarray(warp(once_u8, -theta))[..., 0] * 255.0
    # compare central region (border reflection artifacts excluded)
    m = 16
    np.testing.assert_allclose(
        back[m:-m, m:-m], smooth[m:-m, m:-m].astype(np.float32), atol=6.0
    )


def test_augment_matches_cv2_rotation():
    """General-angle warp agrees with OpenCV warpAffine reflect101 bilinear."""
    import cv2

    from rxtpu.ops.warp import _warp_one

    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:SRC, 0:SRC].astype(np.float32)
    smooth = (127 + 80 * np.sin(yy / 7.0 + 1) * np.cos(xx / 13.0)).astype(np.uint8)
    theta = 0.35
    out = _warp_one(
        jnp.asarray(smooth[None]), jnp.asarray(theta),
        jnp.asarray(False), jnp.asarray(False),
        jnp.zeros(2, jnp.int32), jnp.zeros(1), jnp.ones(1),
        crop_size=SRC, out_dtype=jnp.float32,
    )
    got = np.asarray(out)[..., 0] * 255.0
    # our inverse map corresponds to cv2 rotation by -theta (y-down coords)
    center = ((SRC - 1) / 2.0, (SRC - 1) / 2.0)
    errs = []
    for sign in (+1, -1):
        M = cv2.getRotationMatrix2D(center, sign * np.degrees(theta), 1.0)
        want = cv2.warpAffine(
            smooth.astype(np.float32), M, (SRC, SRC),
            flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101,
        )
        errs.append(np.abs(got - want).mean())
    assert min(errs) < 0.5, f"neither rotation direction matches cv2: {errs}"
