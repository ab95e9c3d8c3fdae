"""Metrics / observability tests."""

import json
import os
import time

from rxtpu.train.metrics import MetricLogger, StepTimer


def test_metric_logger_writes_and_flushes(tmp_path):
    with MetricLogger(str(tmp_path), "exp1", use_tensorboard=False) as log:
        log.log(1, {"loss": 0.5}, prefix="training")
        log.log(2, {"accuracy": 0.9}, prefix="validation")
    path = tmp_path / "exp1" / "metrics.jsonl"
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["training/loss"] == 0.5
    assert lines[1]["validation/accuracy"] == 0.9


def test_metric_logger_tensorboard_events(tmp_path):
    log = MetricLogger(str(tmp_path), "exp2", use_tensorboard=True)
    log.log(1, {"loss": 1.0})
    log.close()
    files = os.listdir(tmp_path / "exp2")
    assert any(f.startswith("events") for f in files)  # flushed TB events


def test_step_timer_stall_accounting():
    t = StepTimer()
    with t.waiting():
        time.sleep(0.02)
    with t.stepping():
        time.sleep(0.08)
    s = t.summary()
    assert 0.05 < s["step_time_s"] < 0.5
    assert 5 < s["input_stall_pct"] < 45
    t.reset()
    assert t.n_steps == 0 and t.total_s == 0


def test_profile_step_loop(tmp_path):
    from rxtpu.utils import profile_step_loop

    calls = []
    summary = profile_step_loop(
        lambda b: calls.append(b) or time.sleep(0.01),
        iter(range(5)),
        logdir=None,
        max_steps=3,
    )
    assert calls == [0, 1, 2]
    assert summary["step_time_s"] > 0.005
    assert 0 <= summary["input_stall_pct"] <= 100


def test_trace_context(tmp_path):
    from rxtpu.utils import trace

    with trace(str(tmp_path / "prof"), enabled=False):
        pass  # disabled path is a no-op
