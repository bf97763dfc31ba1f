"""Structured metrics logging + timing (reference tracing analog).

The reference logs scalars to tensorboardX and the console with CUDA-event
timers (internal/utils.py:14-34, train.py:480-557). Here: an append-only
JSONL metrics log (auditable across restarts, SURVEY.md section 5) plus a
wall-clock rays/sec tracker with jax.block_until_ready semantics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """JSONL metrics (always) + optional TensorBoard scalars.

    The TB stream mirrors the reference's tensorboardX logging
    (train.py:516-533); it is best-effort — absent tensorboardX or a
    writer error never interrupts training.
    """

    def __init__(self, exp_dir: str, name: str = "metrics.jsonl",
                 host_only: bool = True, tensorboard: bool = False):
        self.path = None
        self.tb = None
        import jax
        if not host_only or jax.process_index() == 0:
            os.makedirs(exp_dir, exist_ok=True)
            self.path = os.path.join(exp_dir, name)
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter
                    self.tb = SummaryWriter(os.path.join(exp_dir, "tb"))
                except Exception as e:  # pragma: no cover - optional dep
                    print(f"tensorboard logging disabled: {e}")

    def log(self, step: int, **metrics):
        if self.path is None:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and isinstance(v, float):
                    self.tb.add_scalar(k, v, step)


class Timer:
    """Wall-clock span timer; call mark() to get (seconds, rate)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.count = 0

    def tick(self, n: int = 1):
        self.count += n

    def mark(self):
        dt = time.perf_counter() - self.t0
        rate = self.count / dt if dt > 0 else 0.0
        self.t0 = time.perf_counter()
        self.count = 0
        return dt, rate
