"""Observability: step-time / input-stall instrumentation + metric logging.

The reference's instrumentation is tqdm bars plus a TensorBoard logger that
is closed before training starts and therefore never flushes
(``train.py:139-141``, SURVEY.md §2 quirk 2). Here:

- ``MetricLogger`` writes JSONL (always) and TensorBoard (tensorboardX,
  when importable) and actually flushes/closes at the END.
- ``StepTimer`` measures device step time vs host input-wait time and
  reports input-stall % — the BASELINE.json north-star metric (<2% stall)
  the reference has no way to measure.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, board_dir: str, experiment_id: str, use_tensorboard: bool = True):
        self.dir = os.path.join(board_dir, experiment_id)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(self.dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": int(step)}
        for k, v in metrics.items():
            key = f"{prefix}/{k}" if prefix else k
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class StepTimer:
    """Wall-clock accounting of a training loop.

    Usage per iteration::

        with timer.waiting():   batch = next(it)      # host/input time
        with timer.stepping():  state, m = step(...)  # device time

    ``stall_fraction`` = input-wait / total — the <2% north-star metric.
    """

    def __init__(self):
        self.wait_s = 0.0
        self.step_s = 0.0
        self.n_steps = 0

    class _Phase:
        def __init__(self, timer, attr):
            self.timer, self.attr = timer, attr

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            setattr(self.timer, self.attr, getattr(self.timer, self.attr) + dt)
            if self.attr == "step_s":
                self.timer.n_steps += 1

    def waiting(self):
        return self._Phase(self, "wait_s")

    def stepping(self):
        return self._Phase(self, "step_s")

    @property
    def total_s(self) -> float:
        return self.wait_s + self.step_s

    @property
    def stall_fraction(self) -> float:
        return self.wait_s / self.total_s if self.total_s > 0 else 0.0

    @property
    def mean_step_s(self) -> float:
        return self.step_s / self.n_steps if self.n_steps else 0.0

    def reset(self) -> None:
        self.wait_s = self.step_s = 0.0
        self.n_steps = 0

    def summary(self) -> Dict[str, float]:
        return {
            "step_time_s": self.mean_step_s,
            "input_stall_pct": 100.0 * self.stall_fraction,
        }
