"""Streaming on-device stats vs numpy golden (compute_stats_experiments.py parity)."""

import numpy as np
import pytest

from rxtpu.data.stats import (
    channel_from_path,
    compute_stats_numpy,
    compute_stats_streaming,
    load_stats,
    save_stats,
    stats_table,
    verify_stats,
)


def _fake_images(seed=0, n_exps=3, imgs_per_bucket=4, size=32):
    rng = np.random.default_rng(seed)
    exps = [f"EXP-{i:02d}" for i in range(n_exps)]
    triples = []
    for ei, exp in enumerate(exps):
        for ch in range(1, 7):
            for _ in range(imgs_per_bucket):
                img = rng.integers(0, 256, size=(size, size), dtype=np.uint8)
                triples.append((exp, ch, img))
    return exps, triples


def _batches_from_triples(exps, triples, batch=7):
    """Pack triples into zero-padded device batches with bucket ids."""
    exp_index = {e: i for i, e in enumerate(exps)}
    for i in range(0, len(triples), batch):
        chunk = triples[i : i + batch]
        n = len(chunk)
        size = chunk[0][2].shape[0]
        images = np.zeros((batch, size, size), dtype=np.uint8)
        ids = np.full(batch, -1, dtype=np.int32)
        for j, (exp, ch, img) in enumerate(chunk):
            images[j] = img
            ids[j] = exp_index[exp] * 6 + (ch - 1)
        yield images, ids


def test_streaming_matches_numpy_golden():
    exps, triples = _fake_images()
    golden = compute_stats_numpy(iter(triples))
    streamed = compute_stats_streaming(_batches_from_triples(exps, triples), exps)
    for exp in exps:
        np.testing.assert_allclose(streamed[exp]["mean"], golden[exp]["mean"], rtol=1e-4)
        np.testing.assert_allclose(streamed[exp]["std"], golden[exp]["std"], rtol=1e-3)


def test_verification_pass_normalizes():
    # compute_stats_experiments.py:47-57: re-pass with stats applied -> mean~0 std~1
    exps, triples = _fake_images(seed=1)
    stats = compute_stats_numpy(iter(triples))
    ver = verify_stats(stats, iter(triples))
    for exp in exps:
        np.testing.assert_allclose(ver[exp]["mean"], 0.0, atol=1e-10)
        np.testing.assert_allclose(ver[exp]["std"], 1.0, atol=1e-10)


def test_json_roundtrip(tmp_path):
    exps, triples = _fake_images(n_exps=1, imgs_per_bucket=1)
    stats = compute_stats_numpy(iter(triples))
    p = str(tmp_path / "stats.json")
    save_stats(stats, p)
    loaded = load_stats(p)
    np.testing.assert_allclose(loaded[exps[0]]["mean"], stats[exps[0]]["mean"])
    np.testing.assert_allclose(loaded[exps[0]]["std"], stats[exps[0]]["std"])


def test_reference_pickle_readable(tmp_path):
    # drop-in parity with stats_experiments.pickle (compute_stats_experiments.py:43-44)
    import pickle

    stats = {"HUVEC-01": {"mean": np.arange(6) / 10.0, "std": np.ones(6) * 0.2}}
    p = str(tmp_path / "stats_experiments.pickle")
    with open(p, "wb") as f:
        pickle.dump(stats, f)
    loaded = load_stats(p)
    np.testing.assert_allclose(loaded["HUVEC-01"]["mean"], stats["HUVEC-01"]["mean"])


def test_stats_table_packing():
    stats = {
        "A": {"mean": np.ones(6) * 0.5, "std": np.ones(6) * 0.1},
        "B": {"mean": np.zeros(6), "std": np.ones(6)},
    }
    mean, std = stats_table(stats, ["B", "A"])
    assert mean.shape == (2, 6) and std.shape == (2, 6)
    np.testing.assert_allclose(mean[1], 0.5)
    np.testing.assert_allclose(std[0], 1.0)


def test_channel_from_path():
    # compute_stats_experiments.py:14 filename parse
    assert channel_from_path("data/train/HUVEC-01/Plate1/B05_s2_w4.jpeg") == 4
    assert channel_from_path("K21_s1_w6.png") == 6
