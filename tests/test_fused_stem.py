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


def test_eval_step_fused_stem_matches_default():
    """make_eval_step(fused_stem=True) == the standard folded eval path."""
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import make_eval_step

    cfg = Config(
        data=DataConfig(path_data="unused", crop_size=48, src_size=64),
        model=ModelConfig(backbone="resnet18", nb_classes=8,
                          pretrained=False, compute_dtype="float32"),
        train=TrainConfig(bs_per_device=2),
        experiment_id="fstem",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=2)
    rng = np.random.default_rng(0)
    b, g = 2, 3
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 256, (b, g, 6, 64, 64), dtype=np.uint8)),
        "labels": jnp.asarray(rng.integers(0, 8, (b,)).astype(np.int32)),
        "mean": jnp.asarray(rng.uniform(0.2, 0.6, (b, 6)).astype(np.float32)),
        "std": jnp.asarray(rng.uniform(0.1, 0.4, (b, 6)).astype(np.float32)),
    }
    base = make_eval_step(model, 48)(state, batch)
    fused = make_eval_step(model, 48, fused_stem=True)(state, batch)
    np.testing.assert_allclose(float(fused["loss_sum"]),
                               float(base["loss_sum"]), rtol=2e-2)
    assert float(fused["correct"]) == float(base["correct"])


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
