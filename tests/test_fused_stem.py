"""Fused eval stem kernel vs the op-by-op XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.ops.fused_stem import fused_stem, reference_stem, stem_out_size


def _data(n=2, c=6, h=64, m=16, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(
        rng.integers(0, 256, (n, c, h, h), dtype=np.uint8))
    std = rng.uniform(0.1, 0.4, (n, c)).astype(np.float32)
    mean = rng.uniform(0.2, 0.6, (n, c)).astype(np.float32)
    scale = jnp.asarray(1.0 / (255.0 * std))
    bias = jnp.asarray(-mean / std)
    w = jnp.asarray(rng.standard_normal((7, 7, c, m)).astype(np.float32) * 0.1)
    cb = jnp.asarray(rng.standard_normal(m).astype(np.float32) * 0.5)
    return images, scale, bias, w, cb


@pytest.mark.parametrize("crop", [48, None])
def test_fused_stem_matches_reference(crop):
    images, scale, bias, w, cb = _data()
    got = np.asarray(fused_stem(images, scale, bias, w, cb, crop_size=crop,
                                out_dtype=jnp.float32).astype(jnp.float32))
    want = np.asarray(reference_stem(images, scale, bias, w, cb,
                                     crop_size=crop))
    eff = crop or images.shape[-1]
    po = stem_out_size(eff)
    assert got.shape == (2, 16, po, po)
    # both paths: bf16 inputs to the matmul, f32 accumulation; orders differ
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_fused_stem_zero_pad_semantics():
    """The conv pads the CROPPED image with zeros (reference crops first,
    then torchvision conv pads) — border outputs must match exactly."""
    images, scale, bias, w, cb = _data(n=1, h=32)
    got = np.asarray(fused_stem(images, scale, bias, w, cb, crop_size=16,
                                out_dtype=jnp.float32))
    want = np.asarray(reference_stem(images, scale, bias, w, cb,
                                     crop_size=16))
    np.testing.assert_allclose(got[:, :, 0, :], want[:, :, 0, :],
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(got[:, :, :, -1], want[:, :, :, -1],
                               atol=2e-2, rtol=2e-2)
