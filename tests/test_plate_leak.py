"""Plate-leak inference tests: mask, greedy assignment (host+device), Hungarian."""

import numpy as np
import pytest

from rxtpu.infer import (
    apply_plate_mask,
    constrained_predict,
    greedy_assign,
    greedy_assign_jax,
    hungarian_assign,
    rescale,
)


def _reference_greedy(preds):
    """Line-for-line transcription of test.py:34-56 semantics for goldens."""
    def _rescale(p):
        t = np.sum(p, axis=1)
        t[t == 0] = 1
        return p / np.repeat(t[:, None], p.shape[1], axis=1)

    preds = _rescale(preds.copy())
    results = np.zeros(preds.shape[0])
    for _ in range(preds.shape[0]):
        mpr = np.argmax(preds, axis=1)
        mr = np.argmax(preds[np.arange(len(preds)), mpr])
        mc = mpr[mr]
        results[mr] = mc
        preds[:, mc] = 0
        preds[mr, :] = 0
        preds = _rescale(preds)
    return results


def test_rescale_zero_sum_guard():
    p = np.array([[0.2, 0.2], [0.0, 0.0]])
    r = rescale(p.copy())
    np.testing.assert_allclose(r[0], [0.5, 0.5])
    np.testing.assert_allclose(r[1], [0.0, 0.0])  # guarded, no NaN


def test_plate_mask_zeroes_impossible_classes():
    rng = np.random.default_rng(0)
    n, c = 6, 8
    probs = rng.uniform(0.1, 1.0, size=(n, c))
    plate_groups = np.zeros((c, 4), int)
    for k in range(c):
        plate_groups[k] = np.roll([1, 2, 3, 4], k)
    plates = np.array([1, 2, 3, 4, 1, 2])
    exp_type = 2
    masked = apply_plate_mask(probs, plates, plate_groups, exp_type)
    for i in range(n):
        for k in range(c):
            if plate_groups[k, exp_type] != plates[i]:
                assert masked[i, k] == 0.0
            else:
                assert masked[i, k] > 0.0
    # rows renormalized
    np.testing.assert_allclose(masked.sum(axis=1), 1.0)


def test_greedy_matches_reference_transcription():
    rng = np.random.default_rng(1)
    preds = rng.uniform(0, 1, size=(12, 20))
    got = greedy_assign(preds)
    want = _reference_greedy(preds)
    np.testing.assert_array_equal(got, want)


def test_greedy_jax_matches_numpy():
    rng = np.random.default_rng(2)
    for n, c in [(5, 9), (17, 30), (30, 30)]:
        # float32 on both paths: real softmax probs are f32, and near-tie
        # argmax decisions must see identical values on host and device
        preds = rng.uniform(0, 1, size=(n, c)).astype(np.float32)
        # zero a few rows/cols to exercise the guard
        preds[0] = 0.0
        got = np.asarray(greedy_assign_jax(preds))
        want = greedy_assign(preds)
        np.testing.assert_array_equal(got, want)


def test_greedy_is_a_matching():
    rng = np.random.default_rng(3)
    n, c = 15, 40
    preds = rng.uniform(0.01, 1, size=(n, c))
    out = greedy_assign(preds).astype(int)
    assert len(set(out.tolist())) == n  # one-to-one


def test_hungarian_beats_or_ties_greedy():
    rng = np.random.default_rng(4)
    n, c = 12, 12
    preds = rescale(rng.uniform(0.001, 1, size=(n, c)))

    def total_logp(assign):
        return sum(np.log(preds[i, int(k)]) for i, k in enumerate(assign))

    g = greedy_assign(preds)
    h = hungarian_assign(preds)
    assert len(set(h.astype(int).tolist())) == n
    assert total_logp(h) >= total_logp(g) - 1e-9


def test_constrained_predict_respects_mask():
    rng = np.random.default_rng(5)
    n, c = 8, 12
    probs = rng.uniform(0.1, 1, size=(n, c))
    plate_groups = np.zeros((c, 4), int)
    for k in range(c):
        plate_groups[k] = np.roll([1, 2, 3, 4], k % 4)
    plates = np.array([1, 2, 3, 4, 1, 2, 3, 4])
    for method in ("greedy", "greedy_jax", "hungarian", "argmax"):
        out = constrained_predict(probs, plates, plate_groups, 0, method=method)
        for i, k in enumerate(out.astype(int)):
            assert plate_groups[k, 0] == plates[i], (method, i, k)


def test_constrained_predict_unknown_method():
    with pytest.raises(ValueError):
        constrained_predict(np.ones((2, 4)), np.ones(2, int), np.ones((4, 4), int), 0, "nope")
