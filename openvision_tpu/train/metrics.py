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
        self.wandb = None
        if workdir and self.is_main:
            os.makedirs(workdir, exist_ok=True)
            self.path = os.path.join(workdir, "metrics.jsonl")
            if config is not None:
                with open(os.path.join(workdir, "config.json"), "w") as f:
                    json.dump(_plain(config), f, indent=2, default=str)
        # Optional wandb mirroring (reference main_clip.py:133-147), gated on
        # the package being installed and config.wandb.log_wandb.
        wb_cfg = (config or {}).get("wandb", {}) if hasattr(config, "get") else {}
        if self.is_main and wb_cfg and wb_cfg.get("log_wandb"):
            try:
                import wandb

                if wb_cfg.get("wandb_offline"):
                    os.environ["WANDB_MODE"] = "offline"
                wandb.init(
                    project=str(wb_cfg.get("project", "openvision_tpu")),
                    name=str(wb_cfg.get("experiment", "run")),
                    entity=wb_cfg.get("entity") or None,
                    resume=wb_cfg.get("resume", False),
                    config=_plain(config),
                )
                self.wandb = wandb
            except ImportError:
                print("wandb requested but not installed; metrics to JSONL only")

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
                if self.wandb is not None:
                    self.wandb.log(
                        {k: v for k, v in row.items() if k != "step"},
                        step=row["step"],
                    )

            self.pool.apply_async(write)

    def close(self):
        self._flush()
        self.pool.close()
        self.pool.join()


def _plain(config) -> dict:
    if hasattr(config, "to_dict"):
        return config.to_dict()
    return dict(config)
