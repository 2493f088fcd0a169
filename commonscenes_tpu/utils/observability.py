"""Training observability: metric logging, phase timing, device profiling,
host-memory probing.

Capability parity with the reference's observability surface:
* tensorboardX scalars + loss_log.txt (model/diff_utils/visualizer.py:48-143,
  train_3dfront.py:433-449) → ``MetricLogger`` (JSONL + console + optional
  TensorBoard when tensorboardX/tensorboard is importable);
* per-iteration wall-clock (visualizer.py:80-91) → ``PhaseTimer``;
* /proc/meminfo probe gating in-RAM caches (helpers/psutil.py FreeMemLinux)
  → ``free_memory_gb``;
* plus a TPU upgrade the reference lacks: ``trace`` wraps a block in
  jax.profiler for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.loss_log = open(os.path.join(log_dir, "loss_log.txt"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self.tb = SummaryWriter(log_dir)
            except Exception:
                try:
                    from torch.utils.tensorboard import SummaryWriter  # type: ignore
                    self.tb = SummaryWriter(log_dir)
                except Exception:
                    self.tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        row = {"step": step,
               **{f"{prefix}/{k}": float(v) for k, v in metrics.items()}}
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def message(self, text: str):
        print(text)
        self.loss_log.write(text + "\n")
        self.loss_log.flush()

    def close(self):
        self.jsonl.close()
        self.loss_log.close()
        if self.tb is not None:
            self.tb.close()


class PhaseTimer:
    """Accumulating wall-clock timers per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {f"{k}_ms": 1000 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    import jax
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def free_memory_gb() -> float:
    """MemAvailable from /proc/meminfo in GB (helpers/psutil.py semantics)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable"):
                    return int(line.split()[1]) / (1024 ** 2)
    except OSError:
        pass
    return 0.0
