"""Multi-device SPMD tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
from rxtpu.parallel import (
    make_mesh,
    make_put,
    param_shardings,
    place_state,
    shard_batch,
)
from rxtpu.train import build_model, create_train_state, make_train_step

SRC, CROP = 32, 24


def _cfg():
    return Config(
        data=DataConfig(path_data="unused", crop_size=CROP, src_size=SRC),
        model=ModelConfig(backbone="resnet18", nb_classes=16, pretrained=False,
                          size_features=32, compute_dtype="float32"),
        train=TrainConfig(nb_epochs=2, bs_per_device=2),
        experiment_id="shard",
    )


def _batch(bs, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 16, size=(bs,)).astype(np.int32)
    images = (
        12 * labels[:, None, None, None, None]
        + rng.integers(0, 40, size=(bs, 3, 6, SRC, SRC))
    ).astype(np.uint8)
    return {
        "images": images,
        "labels": labels,
        "mean": np.full((bs, 6), 0.4, np.float32),
        "std": np.full((bs, 6), 0.2, np.float32),
    }


def test_mesh_shapes(eight_cpu_devices):
    mesh = make_mesh(n_devices=8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(n_devices=8, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(n_devices=6, model_parallel=4)


def test_batch_sharded_over_data_axis(eight_cpu_devices):
    mesh = make_mesh(n_devices=8)
    b = shard_batch(_batch(16), mesh)
    shards = b["images"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 2  # 16 / 8


def test_dp_step_matches_single_device(eight_cpu_devices):
    """The sharded step must produce the same numbers as one device."""
    cfg = _cfg()
    model = build_model(cfg)
    state_single, _ = create_train_state(cfg, model, steps_per_epoch=2)
    step = make_train_step(model, CROP, donate=False)
    host = _batch(8)
    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)

    s1, m1 = step(state_single, {k: jnp.asarray(v) for k, v in host.items()}, key, flag)

    mesh = make_mesh(n_devices=8)
    state_dp = place_state(state_single, mesh)
    b = shard_batch(host, mesh)
    with mesh:
        s2, m2 = step(state_dp, b, key, flag)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["accuracy"]), float(m2["accuracy"]))
    # params agree after the update (grad allreduce == full-batch grads)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b_ in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_tensor_parallel_head(eight_cpu_devices):
    """Head kernels shard over 'model'; step still runs and matches DP."""
    cfg = _cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=2)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    shardings = param_shardings(state.params, mesh)
    fc1 = shardings["head"]["fc1"]["kernel"]
    assert fc1.spec == jax.sharding.PartitionSpec(None, "model")
    state_tp = place_state(state, mesh)
    # the head fc1 kernel is physically split over the model axis
    n_shards = len(state_tp.params["head"]["fc1"]["kernel"].addressable_shards)
    assert n_shards == 8  # 4 data replicas x 2 model shards
    shard_cols = state_tp.params["head"]["fc1"]["kernel"].addressable_shards[0].data.shape[1]
    assert shard_cols == state.params["head"]["fc1"]["kernel"].shape[1] // 2

    # momentum buffers live WITH their params: the head kernel's SGD trace
    # is model-sharded too, so no per-step reshard of the opt_state
    def find_head_trace_sharding(opt_state):
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
            keys = [str(k) for k in path]
            if any("fc1" in k for k in keys) and any("kernel" in k for k in keys):
                return leaf.sharding
        raise AssertionError("head fc1 kernel trace not found in opt_state")

    tr_sharding = find_head_trace_sharding(state_tp.opt_state)
    assert tr_sharding.spec == jax.sharding.PartitionSpec(None, "model")

    step = make_train_step(model, CROP, donate=False)
    host = _batch(8)
    with mesh:
        s2, m2 = step(state_tp, shard_batch(host, mesh), jax.random.PRNGKey(0),
                      jnp.asarray(True))
    assert np.isfinite(float(m2["loss"]))


def test_graft_entry_dryrun(eight_cpu_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_put_loop_integration(eight_cpu_devices):
    """run_training's put hook works with the mesh prefetcher."""
    mesh = make_mesh(n_devices=8)
    put = make_put(mesh)
    host_batches = [_batch(8, seed=i) for i in range(3)]
    out = list(put(iter(host_batches)))
    assert len(out) == 3
    for h, d in zip(host_batches, out):
        np.testing.assert_array_equal(np.asarray(d["images"]), h["images"])


def test_run_training_on_mesh_with_pipeline(eight_cpu_devices, synthetic_root, tmp_path):
    """Full training loop end-to-end under the 8-device mesh."""
    import os

    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs
    from rxtpu.train import run_training

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, preload=True)
    stats = {e: {"mean": np.full(6, 0.4), "std": np.full(6, 0.2)}
             for e in idx.experiments}

    cfg = _cfg()
    cfg.data.crop_size = CROP
    cfg.data.src_size = 64
    cfg.train.nb_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path / "models")
    cfg.train.board_dir = str(tmp_path / "board")
    cfg.model.nb_classes = 8

    mesh = make_mesh(n_devices=8)
    put = make_put(mesh)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1, n_devices=8)
    state = place_state(state, mesh)

    pipe_train = Pipeline(idx, store, stats, batch_size=8, mode="train", src_size=64)
    pipe_val = Pipeline(idx, store, stats, batch_size=8, mode="val", src_size=64,
                        drop_last=False, shuffle=False)
    res = run_training(cfg, model, state, pipe_train, pipe_val,
                       base_key=jax.random.PRNGKey(0), put=put,
                       print_fn=lambda *a: None)
    assert res.epochs_run == 1
    assert 0.0 <= res.best_accuracy <= 1.0
    assert os.path.exists(cfg.checkpoint_path)
    # per-device shards saw 1/8 of each batch
    assert len(jax.devices()) == 8


def test_resume_replaces_state_on_mesh(eight_cpu_devices, tmp_path):
    """Resuming under a mesh re-places restored host arrays with the mesh
    shardings (place_fn hook)."""
    import os

    from rxtpu.train import run_training
    from rxtpu.train.checkpoint import save_checkpoint
    from rxtpu.train.loop import last_checkpoint_path

    cfg = _cfg()
    cfg.train.nb_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path / "m")
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    save_checkpoint(last_checkpoint_path(cfg), {
        "params": state.params, "batch_stats": state.batch_stats,
        "opt_state": state.opt_state, "step": state.step,
        "epoch": 1, "best_metric": 0.5,
    })
    mesh = make_mesh(n_devices=8)
    placed = []

    class NoPipe:
        def epoch(self, e, start_batch=0):
            return iter([])
        def __len__(self):
            return 0

    res = run_training(
        cfg, model, place_state(state, mesh), NoPipe(), NoPipe(),
        base_key=jax.random.PRNGKey(0), put=make_put(mesh),
        print_fn=lambda *a: None, resume=True,
        place_fn=lambda st: (placed.append(True), place_state(st, mesh))[1],
    )
    assert placed == [True]
    # restored params carry mesh sharding (replicated over 8 devices)
    leaf = jax.tree_util.tree_leaves(res.state.params)[0]
    assert len(leaf.addressable_shards) == 8


def test_scanned_predict_on_mesh(eight_cpu_devices):
    """shard_batch_window + make_scanned_predict_step == per-batch predict
    on the 8-device mesh (scan axis replicated, batch dim over 'data')."""
    from rxtpu.parallel import shard_batch_window
    from rxtpu.train import make_predict_step, make_scanned_predict_step

    cfg = _cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    mesh = make_mesh(n_devices=8)
    state = place_state(state, mesh)
    rng = np.random.default_rng(7)
    batches = [{
        "images": rng.integers(0, 256, size=(8, 6, 6, SRC, SRC), dtype=np.uint8),
        "mean": rng.uniform(0.2, 0.6, (8, 6)).astype(np.float32),
        "std": rng.uniform(0.1, 0.4, (8, 6)).astype(np.float32),
    } for _ in range(2)]

    with mesh:
        window = shard_batch_window(batches, mesh)
        assert window["images"].shape == (2, 8, 6, 6, SRC, SRC)
        got = np.asarray(make_scanned_predict_step(model, CROP)(state, window))
        pstep = make_predict_step(model, CROP)
        want = np.stack([
            np.asarray(pstep(state, shard_batch(b, mesh))) for b in batches
        ])
    np.testing.assert_allclose(got, want, atol=2e-6)
