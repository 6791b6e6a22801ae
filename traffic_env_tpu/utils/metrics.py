"""Training metrics: JSONL scalar log (always) + TensorBoard events when
torch's SummaryWriter is importable.

Replaces the reference's tf.summary scalars/histograms
(qlearn.py:92-95, algorithms/util.py:12-22): every learner logs loss,
max-Q / entropy, exploration parameter, and the validation
``avg_r_summary`` under the same names so dashboards translate 1:1.
"""

from __future__ import annotations

import json
import os
import time


class MetricWriter:
    def __init__(self, logdir: str, subdir: str = ""):
        self.dir = os.path.join(logdir, subdir) if subdir else logdir
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(self.dir)
        except Exception:
            pass

    def scalar(self, name: str, value, step: int):
        self._f.write(json.dumps({"t": time.time(), "step": int(step),
                                  "name": name, "value": float(value)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(name, float(value), int(step))

    def histogram(self, name: str, values, step: int):
        if self._tb is not None:
            self._tb.add_histogram(name, values, int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
