"""W8A8 post-training quantization (rxtpu.models.quant / rxtpu.infer.quant).

The int8 inference path intentionally changes numerics vs the reference
forward (cell_classifier/test.py:23-32) — these tests pin (a) the exact
quantization semantics, and (b) that accuracy survives: top-1 agreement
with the f32 folded forward plus tight prob deltas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
from rxtpu.infer import (
    calibrate,
    make_quantized_predict_step,
    prepare_quantized,
    quantizable,
    quantize_variables,
)
from rxtpu.infer.fold import fold_variables
from rxtpu.train import build_model, create_train_state
from rxtpu.train.step import make_predict_step


def _cfg(backbone="resnet18", head="mlp", nb_classes=7, crop=24, src=32):
    return Config(
        data=DataConfig(path_data="x", crop_size=crop, src_size=src),
        model=ModelConfig(backbone=backbone, nb_classes=nb_classes,
                          pretrained=False, size_features=16,
                          compute_dtype="float32", head=head),
        train=TrainConfig(), experiment_id="q",
    )


def _batch(rng, n=4, src=32):
    return {
        "images": jnp.asarray(rng.integers(0, 256, (n, 6, 6, src, src),
                                           np.uint8)),
        "mean": jnp.full((n, 6), 0.4), "std": jnp.full((n, 6), 0.2),
    }


def test_quantconv_math():
    """QuantConv == hand-computed symmetric W8A8 semantics."""
    from rxtpu.models.quant import QuantConv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 3)), jnp.float32)
    kq = rng.integers(-127, 128, (3, 3, 3, 4), dtype=np.int8)
    w_scale = np.abs(rng.standard_normal(4)).astype(np.float32) + 0.1
    bias = rng.standard_normal(4).astype(np.float32)
    in_scale = np.float32(0.05)
    params = {"params": {"kernel_q": jnp.asarray(kq),
                         "w_scale": jnp.asarray(w_scale),
                         "bias": jnp.asarray(bias),
                         "in_scale": jnp.asarray(in_scale)}}
    mod = QuantConv(features=4, kernel_size=(3, 3), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], dtype=jnp.float32)
    got = np.asarray(mod.apply(params, x))

    xq = np.clip(np.round(np.asarray(x) / in_scale), -127, 127)
    acc = jax.lax.conv_general_dilated(  # f32 conv of small ints is exact
        jnp.asarray(xq, jnp.float32), jnp.asarray(kq, jnp.float32),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = np.asarray(acc) * (w_scale * in_scale) + bias
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantized_matches_f32_forward():
    """Top-1 agreement + small prob deltas vs the folded f32 forward,
    and the quantized weight tree has the declared structure/dtypes."""
    cfg = _cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    qstats = calibrate(model, state, [_batch(rng), _batch(rng)], 24)
    # every conv INPUT is a live activation => strictly positive range;
    # out_absmax MAY be 0 on untrained nets (zero-init final-BN folds)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(qstats)
    assert min(float(v) for k, v in flat.items()
               if k[-1] == "in_absmax") > 0

    qvars = prepare_quantized(model, state, qstats)
    conv0 = qvars["params"]["backbone"]["conv_init"]
    assert conv0["kernel_q"].dtype == jnp.int8
    assert conv0["w_scale"].shape == (64,)
    assert conv0["in_scale"].shape == ()
    # head passes through folded (bf16/f32), not quantized
    assert "kernel" in qvars["params"]["head"]["fc1"]
    # prepare is the jitted fold+quantize composition: same tree (values
    # can differ in the last f32 ulps from fusion reassociation)
    qvars2 = quantize_variables(
        fold_variables(state.params, state.batch_stats), qstats)
    assert (jax.tree_util.tree_structure(qvars)
            == jax.tree_util.tree_structure(qvars2))

    step = make_quantized_predict_step(model, 24)
    pq = np.asarray(step(qvars, _batch(rng)))
    pf = np.asarray(make_predict_step(model, 24)(state, _batch(rng)))
    np.testing.assert_allclose(pq.sum(-1), 1.0, rtol=1e-5)
    # random-init nets amplify quant noise; trained nets agree harder.
    # seeds fixed -> deterministic
    assert (pq.argmax(-1) == pf.argmax(-1)).mean() >= 0.75
    assert np.abs(pq - pf).max() < 0.08


def test_quantized_tta_and_shared_compile():
    """TTA variants run quantized; qvars ride as a traced arg so two
    different experiments' weights reuse ONE compiled step."""
    from rxtpu.infer.tta import tta_transforms

    cfg = _cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    rng = np.random.default_rng(1)
    qstats = calibrate(model, state, [_batch(rng)], 24)
    qvars = prepare_quantized(model, state, qstats)
    step = make_quantized_predict_step(
        model, 24, transforms=tta_transforms("flips"))
    p1 = np.asarray(step(qvars, _batch(rng)))
    np.testing.assert_allclose(p1.sum(-1), 1.0, rtol=1e-5)
    # a second weight tree (different values, same shapes): no retrace
    qvars2 = jax.tree_util.tree_map(
        lambda a: a if a.dtype == jnp.int8 else a * 1.5, qvars)
    p2 = np.asarray(step(qvars2, _batch(rng)))
    assert step._cache_size() == 1
    assert p1.shape == p2.shape


def test_scanned_quantized_step_parity():
    """Window slices == per-batch quantized step, bitwise per slice."""
    from rxtpu.infer.quant import make_scanned_quantized_predict_step

    cfg = _cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    rng = np.random.default_rng(2)
    qstats = calibrate(model, state, [_batch(rng)], 24)
    qvars = prepare_quantized(model, state, qstats)

    batches = [_batch(rng) for _ in range(3)]
    window = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    scanned = np.asarray(
        make_scanned_quantized_predict_step(model, 24)(qvars, window))
    step = make_quantized_predict_step(model, 24)
    for i, b in enumerate(batches):
        np.testing.assert_array_equal(scanned[i], np.asarray(step(qvars, b)))


def test_densenet_quantized_matches_f32_forward():
    """densenet121 W8A8 (pre-activation BN as explicit affines, post-conv
    BNs folded into the conv dequant — models/densenet.py QuantDenseLayer)
    tracks the f32 eval forward at the backbone-feature level, and the
    prepared tree has the declared structure. crop 32: densenet's five
    downsamples collapse smaller crops to zero spatial size."""
    from rxtpu.models.densenet import densenet121
    from rxtpu.train.step import eval_batch_normalize

    cfg = _cfg(backbone="densenet121", crop=32, src=48)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    assert quantizable(model)
    rng = np.random.default_rng(7)
    qstats = calibrate(model, state, [_batch(rng, n=2, src=48)], 32)
    qvars = prepare_quantized(model, state, qstats)

    bb = qvars["params"]["backbone"]
    assert bb["conv_init"]["kernel_q"].dtype == jnp.int8
    assert set(bb["block1_layer1"]) == {"BatchNorm_0", "Conv_0", "Conv_1"}
    assert set(bb["block1_layer1"]["BatchNorm_0"]) == {"mul", "add"}
    assert set(bb["bn_final"]) == {"mul", "add"}
    # per-channel activation quantization contract (infer/quant.
    # _qconv_entry): consumer convs bake the input scale VECTOR into
    # kernel_q and run with scalar in_scale 1; the stem output requantizes
    # to a per-channel vector
    l1c0 = bb["block1_layer1"]["Conv_0"]
    assert l1c0["in_scale_vec"].ndim == 1
    assert float(l1c0["in_scale"]) == 1.0
    assert bb["conv_init"]["out_scale"].ndim == 1
    # the head rides unquantized WITH its running stats (no fold path)
    assert "kernel" in qvars["params"]["head"]["fc1"]
    assert "head" in qvars["batch_stats"]

    b = _batch(rng, n=2, src=48)
    views = eval_batch_normalize(b["images"], b["mean"], b["std"], 32)
    v = views.reshape((-1,) + views.shape[-3:])[:4]
    f_eval = np.asarray(densenet121(dtype=jnp.float32).apply(
        {"params": state.params["backbone"],
         "batch_stats": state.batch_stats["backbone"]},
        v, train=False), np.float32)
    f_q = np.asarray(densenet121(dtype=jnp.float32, quantized=True).apply(
        {"params": bb}, v, train=False), np.float32)
    rel = np.linalg.norm(f_q - f_eval) / np.linalg.norm(f_eval)
    assert rel < 0.1  # random-init nets amplify quant noise (measured ~5%)

    step = make_quantized_predict_step(model, 32)
    pq = np.asarray(step(qvars, b))
    pf = np.asarray(make_predict_step(model, 32)(state, b))
    np.testing.assert_allclose(pq.sum(-1), 1.0, rtol=1e-5)
    assert (pq.argmax(-1) == pf.argmax(-1)).mean() >= 0.75


def test_quantize_guards():
    cfg = _cfg(head="arcface")
    model = build_model(cfg)
    assert not quantizable(model)
    with pytest.raises(ValueError, match="resnet backbones"):
        make_quantized_predict_step(model, 24)
    # densenet int8 requires the mlp head too (the prepared tree carries
    # the head's running stats — infer/quant.py prepare_quantized)
    assert not quantizable(build_model(_cfg(backbone="densenet121",
                                            head="arcface")))
