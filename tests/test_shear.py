"""Shear-based (gather-free) augmentation: equivalence with the exact warp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.ops import augment_batch, augment_batch_shear, get_augment_fn
from rxtpu.ops.shear import decompose_angle, dihedral, shear_pass

SRC, CROP = 64, 48


def _smooth_batch(b=2, g=3):
    yy, xx = np.mgrid[0:SRC, 0:SRC].astype(np.float32)
    smooth = (127 + 80 * np.sin(yy / 7 + 1) * np.cos(xx / 9)).astype(np.uint8)
    imgs = np.broadcast_to(smooth, (b, g, 6, SRC, SRC)).copy()
    for c in range(6):
        imgs[:, :, c] = np.clip(imgs[:, :, c].astype(int) + c * 5, 0, 255)
    mean = np.full((b, 6), 0.4, np.float32)
    std = np.full((b, 6), 0.2, np.float32)
    return jnp.asarray(imgs), jnp.asarray(mean), jnp.asarray(std)


def test_decompose_angle():
    k, phi = decompose_angle(jnp.asarray([0.0, np.pi / 2, np.pi, -np.pi / 2, 0.3]))
    np.testing.assert_array_equal(np.asarray(k), [0, 1, 2, 3, 0])
    np.testing.assert_allclose(np.asarray(phi), [0, 0, 0, 0, 0.3], atol=1e-6)
    # residual always within [-pi/4, pi/4]
    angles = jnp.linspace(-np.pi, np.pi, 101)
    _, phis = decompose_angle(angles)
    assert float(jnp.max(jnp.abs(phis))) <= np.pi / 4 + 1e-6


def test_shear_pass_golden():
    # pads obey the single-mirror invariant pad < W - 1 (see _pads)
    rng = np.random.default_rng(0)
    pad = 56
    x = rng.uniform(0, 1, (2, 16, 64)).astype(np.float32)
    shift = rng.uniform(-10, 10, (2, 16)).astype(np.float32)
    out = np.asarray(
        shear_pass(jnp.asarray(x), jnp.asarray(shift), 48, pad, pad))
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    for p in range(2):
        for r in range(16):
            t = shift[p, r]
            k, f = int(np.floor(t)) + pad, t - np.floor(t)
            want = xp[p, r, k : k + 48] * (1 - f) + xp[p, r, k + 1 : k + 49] * f
            np.testing.assert_allclose(out[p, r], want, atol=1e-5)


def test_dihedral_matches_gather_at_right_angles():
    """theta in {0, 90, 180, 270} plus flips: shear path is bit-exact vs warp."""
    imgs, mean, std = _smooth_batch(b=1, g=1)
    from rxtpu.ops.warp import _warp_one

    rng = np.random.default_rng(1)
    plane = rng.integers(0, 256, (6, SRC, SRC), dtype=np.uint8)
    for k90 in range(4):
        for vf in (False, True):
            want = _warp_one(
                jnp.asarray(plane), jnp.asarray(k90 * np.pi / 2),
                jnp.asarray(vf), jnp.asarray(False),
                jnp.zeros(2, jnp.int32), jnp.zeros(6), jnp.ones(6),
                crop_size=SRC, out_dtype=jnp.float32,
            )
            got = dihedral(
                jnp.asarray(plane),
                jnp.full(6, vf), jnp.full(6, False), jnp.full(6, k90),
            )
            got = jnp.transpose(got.astype(jnp.float32) / 255.0, (1, 2, 0))
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-4,
                err_msg=f"k90={k90} vflip={vf}",
            )


def test_shear_augment_close_to_gather_warp():
    imgs, mean, std = _smooth_batch()
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        a = np.asarray(augment_batch(imgs, mean, std, key, crop_size=CROP,
                                     train=True, out_dtype=jnp.float32))
        b = np.asarray(augment_batch_shear(imgs, mean, std, key, crop_size=CROP,
                                           train=True, out_dtype=jnp.float32))
        m = 8
        diff = np.abs(a[..., m:-m, m:-m, :] - b[..., m:-m, m:-m, :])
        assert diff.mean() < 0.01, (seed, diff.mean())


def test_shear_eval_path_exact():
    imgs, mean, std = _smooth_batch()
    a = augment_batch(imgs, mean, std, jax.random.PRNGKey(0), crop_size=CROP,
                      train=False, out_dtype=jnp.float32)
    b = augment_batch_shear(imgs, mean, std, jax.random.PRNGKey(0), crop_size=CROP,
                            train=False, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shear_deterministic_per_key():
    imgs, mean, std = _smooth_batch()
    a = augment_batch_shear(imgs, mean, std, jax.random.PRNGKey(5), crop_size=CROP)
    b = augment_batch_shear(imgs, mean, std, jax.random.PRNGKey(5), crop_size=CROP)
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )


def test_get_augment_fn():
    assert get_augment_fn("shear") is augment_batch_shear
    assert get_augment_fn("gather") is augment_batch
    with pytest.raises(ValueError):
        get_augment_fn("nope")


def test_augment_passthrough_backend():
    """'none' backend: pre-augmented views pass through untouched (the
    lockstep parity harness contract, dev/parity_lockstep.py)."""
    fn = get_augment_fn("none")
    views = jnp.ones((2, 3, 8, 8, 6), jnp.float32) * 0.5
    out = fn(views, jnp.zeros((2, 6)), jnp.ones((2, 6)),
             jax.random.PRNGKey(0), crop_size=8, train=True)
    assert out is views


def test_v1_transpose_pipeline_matches_fused():
    """Pin the v1 (transpose-based) 3-pass pipeline to the fused one.

    rotate_crop_normalize is kept as the readable reference formulation of
    rotate_crop_normalize_fused; this parity test keeps it from rotting.
    Also pins apply_dihedral_bits (output-side) against the reversal bits
    folded into the fused finish kernel.
    """
    from rxtpu.ops.shear import (
        apply_dihedral_bits, rotate_crop_normalize, rotate_crop_normalize_fused)

    rng = np.random.default_rng(5)
    p = 4
    planes = jnp.asarray(
        rng.integers(0, 256, size=(p, SRC, SRC), dtype=np.uint8))
    phi = jnp.asarray(rng.uniform(-np.pi / 4, np.pi / 4, p).astype(np.float32))
    crop_yx = jnp.asarray(
        rng.integers(0, SRC - CROP + 1, size=(p, 2)).astype(np.int32))
    scale = jnp.asarray(rng.uniform(0.5, 2.0, p).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-1.0, 1.0, p).astype(np.float32))
    rrev = jnp.asarray([False, True, False, True])
    crev = jnp.asarray([False, False, True, True])

    v1 = rotate_crop_normalize(planes, phi, crop_yx, CROP, scale, bias)
    v1 = apply_dihedral_bits(
        v1, jnp.zeros(p, bool), rrev, crev)  # swap handled input-side
    fused = rotate_crop_normalize_fused(
        planes, phi, crop_yx, CROP, scale, bias, rrev, crev)
    np.testing.assert_allclose(
        np.asarray(v1), np.asarray(fused), atol=2e-3, rtol=0)
