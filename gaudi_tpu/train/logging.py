"""Experiment metrics: jsonl always, TensorBoard when available.

The reference logs via torch SummaryWriter (train_edm.py:93-94,127). Here the
primary sink is a machine-readable metrics.jsonl (one dict per event) with an
optional tensorboardX mirror, plus stdout epoch summaries.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, exp_dir: str, use_tensorboard: bool = True):
        os.makedirs(exp_dir, exist_ok=True)
        self._f = open(os.path.join(exp_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir=exp_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
