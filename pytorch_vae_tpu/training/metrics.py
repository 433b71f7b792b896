"""Metric logging: TensorBoard scalars + JSONL fallback.

The reference logs ~20 scalars per step/epoch to TensorBoard with
sync_dist=True (experiment.py:402-437). Here metrics come out of the jitted
step already globally reduced (GSPMD means every host sees the same scalar),
and only process 0 writes.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: str, enabled: bool = True):
        self.log_dir = log_dir
        self.enabled = enabled
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def write(self, step: int, metrics: Dict[str, float],
              prefix: Optional[str] = None) -> None:
        if not self.enabled:
            return
        rec = {}
        for k, v in metrics.items():
            name = f"{prefix}/{k}" if prefix else k
            v = float(v)
            rec[name] = v
            if self._tb is not None:
                self._tb.add_scalar(name, v, step)
        if self._jsonl is not None:
            rec["_step"] = int(step)
            rec["_time"] = time.time()
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
