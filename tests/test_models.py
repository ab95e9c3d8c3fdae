"""Model tests: shapes, grouping semantics, stem init, torch porting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.models import (
    ArcFaceHead,
    DummyClassifier,
    TwoSitesNN,
    port_torch_resnet50,
    resnet18,
    stem_kernel_from_rgb,
)
from rxtpu.models.pretrained import synthetic_resnet50_state_dict


def test_resnet18_features_shape():
    m = resnet18(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (2, 512)


def test_twosites_forward_train_and_test_shapes():
    m = TwoSitesNN(backbone="resnet18", nb_classes=11, dtype=jnp.float32)
    x3 = jnp.zeros((2, 3, 48, 48, 6))  # train: img/neg/pos (dataloader.py:177)
    vars_ = m.init(jax.random.PRNGKey(0), x3)
    logits = m.apply(vars_, x3)
    assert logits.shape == (2, 11)
    # test: G=6, two sites per group (dataloader.py:205-207, models.py:46-50)
    x6 = jnp.zeros((2, 6, 48, 48, 6))
    logits6 = m.apply(vars_, x6)
    assert logits6.shape == (2, 11)


def test_twosites_group_mean_semantics():
    """G=6 with both sites identical must equal G=3 logits (2-view TTA mean)."""
    m = TwoSitesNN(backbone="resnet18", nb_classes=7, dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    x3 = jax.random.normal(key, (2, 3, 48, 48, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x3)
    # duplicate each view -> [img,img,neg,neg,pos,pos]
    x6 = jnp.repeat(x3, 2, axis=1)
    l3 = m.apply(vars_, x3)
    l6 = m.apply(vars_, x6)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l6), rtol=2e-4, atol=2e-4)


def test_twosites_rejects_bad_group_axis():
    m = TwoSitesNN(backbone="resnet18", nb_classes=7, dtype=jnp.float32)
    with pytest.raises(AssertionError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 48, 48, 6)))


def test_stem_kernel_from_rgb_rule():
    # models.py:24-26: each of the 6 input channels = mean over RGB of conv1
    rgb = np.random.default_rng(0).normal(size=(7, 7, 3, 64)).astype(np.float32)
    stem = stem_kernel_from_rgb(rgb)
    assert stem.shape == (7, 7, 6, 64)
    expected = rgb.mean(axis=2)
    for c in range(6):
        np.testing.assert_allclose(stem[:, :, c, :], expected)


def test_torch_resnet50_porting():
    from rxtpu.models import resnet50

    sd = synthetic_resnet50_state_dict(seed=0)
    m = resnet50(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    params = {"backbone": jax.tree_util.tree_map(np.asarray, vars_["params"])}
    stats = {"backbone": jax.tree_util.tree_map(np.asarray, vars_["batch_stats"])}
    new_params, new_stats = port_torch_resnet50(sd, params, stats)
    # stem follows the 6-channel rule
    got = new_params["backbone"]["conv_init"]["kernel"]
    want = stem_kernel_from_rgb(np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(got, want)
    # a deep conv actually got the torch weights
    got = new_params["backbone"]["stage3_block4"]["Conv_1"]["kernel"]
    want = np.transpose(sd["layer3.3.conv2.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    # bn running stats ported into batch_stats
    np.testing.assert_allclose(
        new_stats["backbone"]["bn_init"]["var"], sd["bn1.running_var"]
    )
    # ported params still run
    out = m.apply(
        {"params": new_params["backbone"], "batch_stats": new_stats["backbone"]}, x
    )
    assert out.shape == (1, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_arcface_margin_applied_only_to_target():
    head = ArcFaceHead(nb_classes=5, size_features=8, dropout=0.0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    labels = jnp.array([0, 1, 2, 3])
    vars_ = head.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, train=True, labels=labels,
    )
    infer = head.apply(vars_, x, train=False)
    trained, _ = head.apply(
        vars_, x, train=True, labels=labels,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert infer.shape == (4, 5)
    # at train time the target logit is reduced (margin), others from train-mode BN
    tgt = np.asarray(trained)[np.arange(4), np.asarray(labels)]
    # recompute the no-margin train-mode logits by applying margin=0
    head0 = ArcFaceHead(nb_classes=5, size_features=8, dropout=0.0, margin=0.0, dtype=jnp.float32)
    nomargin, _ = head0.apply(
        vars_, x, train=True, labels=labels,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    tgt0 = np.asarray(nomargin)[np.arange(4), np.asarray(labels)]
    assert (tgt < tgt0 + 1e-6).all()
    off = np.asarray(trained) + 0.0
    off0 = np.asarray(nomargin)
    mask = np.ones_like(off, bool)
    mask[np.arange(4), np.asarray(labels)] = False
    np.testing.assert_allclose(off[mask], off0[mask], rtol=1e-5)


def test_dummy_classifier_distribution():
    # models.py:60-68: uniform logits in [-1, 1]
    d = DummyClassifier(nb_classes=100, seed=0)
    out = np.asarray(d(jnp.zeros((32, 1))))
    assert out.shape == (32, 100)
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert out.std() > 0.4  # uniform on [-1,1] has std ~0.577
    out2 = np.asarray(d(jnp.zeros((32, 1))))
    assert not np.allclose(out, out2)  # stateful key advances


def test_densenet121_features_shape():
    from rxtpu.models import densenet121

    m = densenet121(dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 1024)
    assert np.isfinite(np.asarray(out)).all()


def test_control_calibration_semantics():
    """Calibrated model: shifting img and neg embeddings identically changes
    nothing in the (img - neg) feature; the plain model does change."""
    m = TwoSitesNN(backbone="resnet18", nb_classes=5, control_calibration=True,
                   dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 48, 48, 6))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    base = m.apply(vars_, x)
    assert base.shape == (2, 5)
    assert np.isfinite(np.asarray(base)).all()
    # identical img and neg views -> img - neg feature is exactly zero, so
    # swapping in any other identical pair yields identical calibrated term
    same = x.at[:, 1].set(x[:, 0])
    out_same = m.apply(vars_, same)
    other = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 48, 48, 6))
    other = other.at[:, 1].set(other[:, 0]).at[:, 2].set(same[:, 2])
    out_other = m.apply(vars_, other)
    # calibrated img-part and pos-part match; only the raw neg context differs
    assert not np.allclose(np.asarray(out_same), np.asarray(out_other))


def test_resnet101_and_152_shapes():
    from rxtpu.models import resnet101, resnet152

    for ctor, blocks in ((resnet101, 23), (resnet152, 36)):
        m = ctor(dtype=jnp.float32)
        assert m.stage_sizes[2] == blocks
    m = resnet101(dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 6))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 2048)


def test_torch_resnet18_porting():
    from rxtpu.models.pretrained import port_torch_resnet, synthetic_resnet_state_dict

    sd = synthetic_resnet_state_dict("resnet18", seed=2)
    m = resnet18(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    params = {"backbone": jax.tree_util.tree_map(np.asarray, vars_["params"])}
    stats = {"backbone": jax.tree_util.tree_map(np.asarray, vars_["batch_stats"])}
    new_params, new_stats = port_torch_resnet(sd, params, stats, arch="resnet18")
    got = new_params["backbone"]["stage4_block2"]["Conv_1"]["kernel"]
    want = np.transpose(sd["layer4.1.conv2.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    out = m.apply(
        {"params": new_params["backbone"], "batch_stats": new_stats["backbone"]}, x
    )
    assert out.shape == (1, 512) and np.isfinite(np.asarray(out)).all()


def test_torch_densenet121_porting():
    from rxtpu.models.densenet import densenet121
    from rxtpu.models.pretrained import (
        port_torch_densenet121, synthetic_densenet121_state_dict,
    )

    sd = synthetic_densenet121_state_dict(seed=3)
    m = densenet121(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    params = {"backbone": jax.tree_util.tree_map(np.asarray, vars_["params"])}
    stats = {"backbone": jax.tree_util.tree_map(np.asarray, vars_["batch_stats"])}
    new_params, new_stats = port_torch_densenet121(sd, params, stats)
    # stem follows the 6-channel mean-RGB rule
    got = new_params["backbone"]["conv_init"]["kernel"]
    want = stem_kernel_from_rgb(np.transpose(sd["features.conv0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(got, want)
    # a deep dense layer actually got the torch weights
    got = new_params["backbone"]["block3_layer17"]["Conv_1"]["kernel"]
    want = np.transpose(sd["features.denseblock3.denselayer17.conv2.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    # transition + final norm running stats ported
    np.testing.assert_allclose(
        new_stats["backbone"]["transition2"]["BatchNorm_0"]["var"],
        sd["features.transition2.norm.running_var"],
    )
    np.testing.assert_allclose(
        new_stats["backbone"]["bn_final"]["mean"], sd["features.norm5.running_mean"]
    )
    # ported params still run
    out = m.apply(
        {"params": new_params["backbone"], "batch_stats": new_stats["backbone"]}, x
    )
    assert out.shape == (1, 1024)
    assert np.isfinite(np.asarray(out)).all()
