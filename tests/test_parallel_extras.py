"""Multi-host input sharding + orbax checkpoint + TTA/ArcFace extras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.parallel import (
    assemble_global_batch,
    host_shard_bounds,
    make_mesh,
    shard_records_for_host,
)


def test_host_shard_bounds():
    assert host_shard_bounds(128, 4, 0) == (0, 32)
    assert host_shard_bounds(128, 4, 3) == (96, 128)
    with pytest.raises(AssertionError):
        host_shard_bounds(100, 3, 0)


def test_shard_records_cover_batch_exactly():
    order = np.random.default_rng(0).permutation(64)
    shards = [shard_records_for_host(order, 16, 4, h) for h in range(4)]
    # 4 batches, each host owns 4 rows of each
    assert all(len(s) == 4 for s in shards)
    for b in range(4):
        got = np.concatenate([shards[h][b] for h in range(4)])
        np.testing.assert_array_equal(got, order[b * 16 : (b + 1) * 16])


def test_assemble_global_batch_single_host(eight_cpu_devices):
    mesh = make_mesh(n_devices=8)
    batch = {
        "images": np.arange(8 * 4, dtype=np.uint8).reshape(8, 4),
        "id_codes": ["a"] * 8,
    }
    out = assemble_global_batch(batch, mesh)
    assert out["images"].shape == (8, 4)
    assert len(out["images"].addressable_shards) == 8
    np.testing.assert_array_equal(np.asarray(out["images"]), batch["images"])
    assert out["id_codes"] == ["a"] * 8


@pytest.fixture(scope="module")
def pipe_parts(synthetic_root):
    import os

    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, preload=True)
    exps = sorted({r.experiment for r in idx.records})
    stats = {e: {"mean": np.full(6, 0.5), "std": np.full(6, 0.25)} for e in exps}

    def make(num_hosts=1, host_id=0, bs=8):
        return Pipeline(idx, store, stats, bs, "train", src_size=64, seed=7,
                        num_hosts=num_hosts, host_id=host_id)

    return make


def test_host_sliced_pipeline_equals_global(pipe_parts):
    """Pod input feeding invariant: every host decodes only its rows, and the
    concatenation of all hosts' slices is BIT-IDENTICAL to the single-host
    global batch (same seed => same order, same per-sample view draws)."""
    make = pipe_parts
    global_batches = list(make().epoch(3))
    assert global_batches, "synthetic dataset too small for bs=8"
    per_host = [list(make(num_hosts=4, host_id=h).epoch(3)) for h in range(4)]
    assert all(len(b) == len(global_batches) for b in per_host)
    for bi, gb in enumerate(global_batches):
        for key in ("images", "labels", "mean", "std", "valid"):
            got = np.concatenate([per_host[h][bi][key] for h in range(4)])
            np.testing.assert_array_equal(got, gb[key], err_msg=key)
        # id_codes are GLOBAL metadata: every host yields the full list
        for h in range(4):
            assert per_host[h][bi]["id_codes"] == gb["id_codes"]


def test_sliced_input_identical_step_numerics(pipe_parts, eight_cpu_devices):
    """Single-process equivalence of the pod feed: the global batch assembled
    from process-local data trains IDENTICALLY to the directly-sharded batch
    on the 8-device mesh (what a 4-host pod slice would compute)."""
    import jax

    from rxtpu.parallel import make_put, place_state
    from rxtpu.parallel.mesh import shard_batch
    from rxtpu.parallel.multihost import multihost_prefetch
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.train import build_model, create_train_state, make_train_step

    make = pipe_parts
    cfg = Config(
        data=DataConfig(path_data="x", crop_size=48, src_size=64),
        model=ModelConfig(backbone="resnet18", nb_classes=8, pretrained=False,
                          size_features=16, compute_dtype="float32"),
        train=TrainConfig(), experiment_id="mh",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    mesh = make_mesh(n_devices=8)
    step = make_train_step(model, 48, donate=False)

    batch = next(iter(make().epoch(0)))
    batch.pop("id_codes"), batch.pop("valid")

    with mesh:
        s_ref = place_state(state, mesh)
        _, m_ref = step(s_ref, shard_batch(batch, mesh), jax.random.PRNGKey(1),
                        jnp.asarray(True))
        # feed the SAME rows through the multi-host assembly path
        mh = next(iter(multihost_prefetch(iter([batch]), mesh)))
        s_mh = place_state(state, mesh)
        _, m_mh = step(s_mh, mh, jax.random.PRNGKey(1), jnp.asarray(True))
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_mh["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m_ref["grad_norm"]), float(m_mh["grad_norm"]), rtol=1e-5
    )


def test_make_put_single_process_dispatch(eight_cpu_devices):
    """make_put returns the sharded prefetcher when process_count == 1."""
    from rxtpu.parallel import make_put

    mesh = make_mesh(n_devices=8)
    put = make_put(mesh)
    batch = {"images": np.zeros((8, 2), np.uint8)}
    out = list(put(iter([batch])))
    assert len(out) == 1 and out[0]["images"].shape == (8, 2)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from rxtpu.train.checkpoint import load_checkpoint_orbax, save_checkpoint_orbax

    payload = {
        "params": {"w": np.ones((3, 2), np.float32), "b": np.zeros(2, np.float32)},
        "step": np.asarray(7),
    }
    p = str(tmp_path / "ckpt_orbax")
    save_checkpoint_orbax(p, payload)
    loaded = load_checkpoint_orbax(p)
    np.testing.assert_array_equal(loaded["params"]["w"], payload["params"]["w"])
    assert int(loaded["step"]) == 7
    # overwrite works
    payload["step"] = np.asarray(9)
    save_checkpoint_orbax(p, payload)
    assert int(load_checkpoint_orbax(p)["step"]) == 9


def test_tta_flips_variants(tmp_path):
    """Dihedral TTA: averaged probs differ from identity but stay normalized,
    and are identical for symmetric inputs."""
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.infer import make_tta_predict_step
    from rxtpu.train import build_model, create_train_state

    cfg = Config(
        data=DataConfig(path_data="x", crop_size=24, src_size=32),
        model=ModelConfig(backbone="resnet18", nb_classes=7, pretrained=False,
                          size_features=16, compute_dtype="float32"),
        train=TrainConfig(), experiment_id="tta",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (2, 6, 6, 32, 32), np.uint8)),
        "mean": jnp.full((2, 6), 0.4), "std": jnp.full((2, 6), 0.2),
    }
    p_id = np.asarray(make_tta_predict_step(model, 24, "none")(state, batch))
    p_fl = np.asarray(make_tta_predict_step(model, 24, "flips")(state, batch))
    np.testing.assert_allclose(p_id.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(p_fl.sum(-1), 1.0, rtol=1e-5)
    assert not np.allclose(p_id, p_fl)
    with pytest.raises(ValueError):
        make_tta_predict_step(model, 24, "bogus")


def test_arcface_train_step(tmp_path):
    """ArcFace head trains end to end through the fused step."""
    import os

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.train import build_model, create_train_state, make_train_step

    cfg = Config(
        data=DataConfig(path_data="x", crop_size=24, src_size=32),
        model=ModelConfig(backbone="resnet18", nb_classes=7, pretrained=False,
                          size_features=16, head="arcface",
                          compute_dtype="float32"),
        train=TrainConfig(nb_epochs=1, bs_per_device=2,
                          checkpoint_dir=os.path.join(str(tmp_path), "m")),
        experiment_id="arc",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (2, 3, 6, 32, 32), np.uint8)),
        "labels": jnp.asarray([1, 3]),
        "mean": jnp.full((2, 6), 0.4), "std": jnp.full((2, 6), 0.2),
    }
    step = make_train_step(model, 24, donate=False)
    s1, m = step(state, batch, jax.random.PRNGKey(0), jnp.asarray(True))
    assert np.isfinite(float(m["loss"]))
    # params moved
    l0 = jax.tree_util.tree_leaves(state.params["head"])
    l1 = jax.tree_util.tree_leaves(s1.params["head"])
    assert any(not np.array_equal(a, b) for a, b in zip(l0, l1))


def test_tta_logit_averaging(tmp_path):
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.infer import make_tta_predict_step
    from rxtpu.train import build_model, create_train_state

    cfg = Config(
        data=DataConfig(path_data="x", crop_size=24, src_size=32),
        model=ModelConfig(backbone="resnet18", nb_classes=7, pretrained=False,
                          size_features=16, compute_dtype="float32"),
        train=TrainConfig(), experiment_id="ttal",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    rng = np.random.default_rng(1)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (2, 6, 6, 32, 32), np.uint8)),
        "mean": jnp.full((2, 6), 0.4), "std": jnp.full((2, 6), 0.2),
    }
    pl_ = np.asarray(make_tta_predict_step(model, 24, "flips", "logits")(state, batch))
    pp = np.asarray(make_tta_predict_step(model, 24, "flips", "probs")(state, batch))
    np.testing.assert_allclose(pl_.sum(-1), 1.0, rtol=1e-5)
    assert not np.allclose(pl_, pp)  # geometric vs arithmetic averaging differ
    with pytest.raises(ValueError):
        make_tta_predict_step(model, 24, "flips", "median")


def test_predict_dataset_scan_window(synthetic_root, eight_cpu_devices):
    """predict_dataset(scan_window=K) == per-batch drain, incl. the padded
    tail window (3 batches, K=2) and id ordering, on the 8-device mesh."""
    import os

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs
    from rxtpu.infer import predict_dataset
    from rxtpu.parallel import make_mesh, place_state
    from rxtpu.train import build_model, create_train_state

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "test")
    idx = load_metadata(df, dfc, "test")
    store = ByteStore(idx, root, preload=True)
    exps = sorted({r.experiment for r in idx.records})
    stats = {e: {"mean": np.full(6, 0.5), "std": np.full(6, 0.25)} for e in exps}

    def mkpipe():
        return Pipeline(idx, store, stats, 4, "test", src_size=64, seed=7,
                        shuffle=False, drop_last=False)

    n_batches = len(list(mkpipe().epoch(0)))
    assert n_batches == 3, n_batches  # odd count: the K=2 tail is exercised

    cfg = Config(
        data=DataConfig(path_data="x", crop_size=32, src_size=64),
        model=ModelConfig(backbone="resnet18", nb_classes=8, pretrained=False,
                          size_features=8, compute_dtype="float32"),
        train=TrainConfig(), experiment_id="scanw",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    mesh = make_mesh(n_devices=4)  # bs=4 must divide the 'data' axis
    with mesh:
        state = place_state(state, mesh)
        want_p, want_ids = predict_dataset(model, state, mkpipe(), 32)
        got_p, got_ids = predict_dataset(model, state, mkpipe(), 32,
                                         scan_window=2, mesh=mesh)
    assert got_ids == want_ids
    np.testing.assert_allclose(got_p, want_p, atol=2e-6)
