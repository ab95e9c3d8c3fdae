"""Training engine tests: schedule, freeze mask, step, loop, checkpointing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
from rxtpu.train import (
    BestCheckpointer,
    TrainState,
    backbone_trainable_at_epoch,
    build_model,
    checkpoint_exists,
    cosine_epoch_schedule,
    create_train_state,
    cross_entropy,
    head_only_mask,
    load_checkpoint,
    make_eval_step,
    make_train_step,
)

SRC, CROP = 48, 32


def _tiny_cfg(tmpdir, **train_kw):
    return Config(
        data=DataConfig(path_data="unused", crop_size=CROP, src_size=SRC),
        model=ModelConfig(backbone="resnet18", nb_classes=5, pretrained=False,
                          size_features=16, compute_dtype="float32"),
        train=TrainConfig(nb_epochs=2, bs_per_device=2,
                          checkpoint_dir=os.path.join(str(tmpdir), "models"),
                          board_dir=os.path.join(str(tmpdir), "board"),
                          **train_kw),
        experiment_id="t",
    )


def _fake_batch(bs=2, g=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 256, size=(bs, g, 6, SRC, SRC), dtype=np.uint8),
        "labels": rng.integers(0, 5, size=(bs,)).astype(np.int32),
        "mean": np.full((bs, 6), 0.4, np.float32),
        "std": np.full((bs, 6), 0.2, np.float32),
    }


def test_cosine_epoch_schedule_parity():
    # torch CosineAnnealingLR(T_max=E, eta_min=lr/100) stepped per epoch
    lr0, E, spe = 0.1, 10, 7
    sched = cosine_epoch_schedule(lr0, E, spe)
    eta_min = lr0 / 100
    for epoch in range(E + 1):
        want = eta_min + (lr0 - eta_min) * (1 + np.cos(np.pi * epoch / E)) / 2
        got = float(sched(jnp.asarray(epoch * spe)))  # first step of that epoch
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
    # lr is constant within an epoch
    assert float(sched(jnp.asarray(3 * spe))) == float(sched(jnp.asarray(4 * spe - 1)))


def test_backbone_trainable_schedule():
    # train.py:46-67: pretrained -> epochs 1-2 head only, epoch 3+ everything
    assert not backbone_trainable_at_epoch(1, True)
    assert not backbone_trainable_at_epoch(2, True)
    assert backbone_trainable_at_epoch(3, True)
    assert backbone_trainable_at_epoch(1, False)  # scratch: never frozen


def test_head_only_mask_structure(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=3)
    mask = head_only_mask(state.params)
    leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
    head_leaves = [v for p, v in leaves if "head" in str(p[0])]
    backbone_leaves = [v for p, v in leaves if "backbone" in str(p[0])]
    assert head_leaves and all(head_leaves)
    assert backbone_leaves and not any(backbone_leaves)


def test_train_step_updates_head_only_when_frozen(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=3)
    step = make_train_step(model, CROP, donate=False)
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    key = jax.random.PRNGKey(0)

    s1, m = step(state, batch, key, jnp.asarray(False))
    assert np.isfinite(float(m["loss"]))
    # backbone untouched, head moved
    bb0 = jax.tree_util.tree_leaves(state.params["backbone"])
    bb1 = jax.tree_util.tree_leaves(s1.params["backbone"])
    assert all(np.array_equal(a, b) for a, b in zip(bb0, bb1))
    h0 = jax.tree_util.tree_leaves(state.params["head"])
    h1 = jax.tree_util.tree_leaves(s1.params["head"])
    assert any(not np.array_equal(a, b) for a, b in zip(h0, h1))
    # batch stats still update while frozen (torch BN semantics)
    st0 = jax.tree_util.tree_leaves(state.batch_stats)
    st1 = jax.tree_util.tree_leaves(s1.batch_stats)
    assert any(not np.array_equal(a, b) for a, b in zip(st0, st1))

    s2, _ = step(state, batch, key, jnp.asarray(True))
    bb2 = jax.tree_util.tree_leaves(s2.params["backbone"])
    assert any(not np.array_equal(a, b) for a, b in zip(bb0, bb2))


def test_train_step_loss_decreases(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.train.lr = 0.02
    model = build_model(cfg)
    state, lr = create_train_state(cfg, model, steps_per_epoch=1)
    assert lr == 0.02
    step = make_train_step(model, CROP, donate=False)
    # learnable signal: image intensity encodes the label (augmentation-invariant)
    rng = np.random.default_rng(0)
    labels = np.arange(4, dtype=np.int32)
    images = (
        40 * labels[:, None, None, None, None]
        + rng.integers(0, 30, size=(4, 3, 6, SRC, SRC))
    ).astype(np.uint8)
    batch = {
        "images": jnp.asarray(images),
        "labels": jnp.asarray(labels),
        "mean": jnp.full((4, 6), 0.4, jnp.float32),
        "std": jnp.full((4, 6), 0.2, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(25):
        state, m = step(state, batch, key, jnp.asarray(True))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_eval_step_respects_valid_mask(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    ev = make_eval_step(model, CROP)
    b = _fake_batch(bs=4)
    b["valid"] = np.array([1, 1, 0, 0], np.float32)
    m = ev(state, {k: jnp.asarray(v) for k, v in b.items()})
    assert float(m["count"]) == 2.0
    # padded rows contribute nothing
    b2 = {k: (v[:2] if k != "valid" else None) for k, v in b.items()}
    b2.pop("valid")
    m2 = ev(state, {k: jnp.asarray(v) for k, v in b2.items()})
    np.testing.assert_allclose(float(m["loss_sum"]), float(m2["loss_sum"]), rtol=2e-5)


def test_best_checkpointer_roundtrip(tmp_path):
    p = str(tmp_path / "models" / "best_model_x.ckpt")
    ck = BestCheckpointer(p)
    assert ck.update(0.1, {"params": {"w": np.ones(3)}})     # first always saves
    assert not ck.update(0.05, {"params": {"w": np.zeros(3)}})  # worse: no save
    assert ck.update(0.2, {"params": {"w": np.full(3, 2.0)}})
    assert checkpoint_exists(p)
    loaded = load_checkpoint(p)
    np.testing.assert_array_equal(loaded["params"]["w"], np.full(3, 2.0))
    assert loaded["best_metric"] == 0.2


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]])
    labels = jnp.asarray([0, 1])
    got = float(cross_entropy(logits, labels))
    p = jax.nn.log_softmax(logits)
    want = float(-(p[0, 0] + p[1, 1]) / 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resume_from_last_checkpoint(tmp_path):
    """Mid-training resume restores step/params/opt_state and epoch position."""
    from rxtpu.train.checkpoint import save_checkpoint
    from rxtpu.train.loop import last_checkpoint_path

    cfg = _tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    step = make_train_step(model, CROP, donate=False)
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(0), jnp.asarray(True))
    save_checkpoint(last_checkpoint_path(cfg), {
        "params": state.params, "batch_stats": state.batch_stats,
        "opt_state": state.opt_state, "step": state.step,
        "epoch": 1, "best_metric": 0.25,
    })

    # drive run_training with empty pipes is heavy; instead reuse the restore
    # logic directly by calling run_training with resume on zero-epoch config
    cfg.train.nb_epochs = 1

    class OnePipe:
        def __init__(self):
            self.batches = [_fake_batch(seed=9)]
        def epoch(self, e, start_batch=0):
            return iter([dict(b, valid=np.ones(2, np.float32)) for b in self.batches])
        def __len__(self):
            return 1

    from rxtpu.train import run_training
    fresh, _ = create_train_state(cfg, model, steps_per_epoch=1)
    res = run_training(
        cfg, model, fresh, OnePipe(), OnePipe(),
        base_key=jax.random.PRNGKey(0), print_fn=lambda *a: None, resume=True,
    )
    # resumed past epoch 1 with nb_epochs=1 -> no training ran, state preserved
    assert int(res.state.step) == 3
    assert res.best_accuracy == 0.25


def test_scanned_eval_matches_per_batch_sums(tmp_path):
    """make_scanned_eval_step == sum of make_eval_step over the window."""
    from rxtpu.train import make_scanned_eval_step

    cfg = _tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    batches = [_fake_batch(bs=4, seed=s) for s in range(3)]
    for b in batches:
        b["valid"] = np.ones(4, np.float32)
    batches[2]["valid"][2:] = 0.0

    ev = make_eval_step(model, CROP)
    want = {"loss_sum": 0.0, "correct": 0.0, "count": 0.0}
    for b in batches:
        m = ev(state, {k: jnp.asarray(v) for k, v in b.items()})
        want = {k: want[k] + float(m[k]) for k in want}

    stacked = {
        k: jnp.asarray(np.stack([b[k] for b in batches])) for k in batches[0]
    }
    got = make_scanned_eval_step(model, CROP)(state, stacked)
    for k in want:
        np.testing.assert_allclose(float(got[k]), want[k], rtol=2e-5)


def test_scanned_predict_matches_per_batch(tmp_path):
    """Each window slice of make_scanned_predict_step == make_predict_step."""
    from rxtpu.train import make_predict_step, make_scanned_predict_step

    cfg = _tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    rng = np.random.default_rng(3)
    batches = []
    for _ in range(2):  # G=6 two-site test batches, full-size (no crop)
        batches.append({
            "images": rng.integers(0, 256, size=(2, 6, 6, SRC, SRC),
                                   dtype=np.uint8),
            "mean": rng.uniform(0.2, 0.6, (2, 6)).astype(np.float32),
            "std": rng.uniform(0.1, 0.4, (2, 6)).astype(np.float32),
        })

    pstep = make_predict_step(model, crop_size=None)
    want = np.stack([
        np.asarray(pstep(state, {k: jnp.asarray(v) for k, v in b.items()}))
        for b in batches
    ])
    stacked = {
        k: jnp.asarray(np.stack([b[k] for b in batches])) for k in batches[0]
    }
    got = np.asarray(make_scanned_predict_step(model, crop_size=None)(state, stacked))
    assert got.shape == want.shape == (2, 2, cfg.model.nb_classes)
    np.testing.assert_allclose(got, want, atol=2e-6)
