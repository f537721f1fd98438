"""Training chronometer: throughput, ETA, core-hours accounting.

Capability parity with reference src/helpers/utils.py:266-442 (Chrono):
img/sec/core, core_hours per device kind, examples_seen, epoch, progress,
pause/resume around evals/checkpoints, and save/load of its accumulators so
resumed jobs keep correct totals.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np


class Chrono:
    def __init__(self):
        self.program_start_time = time.monotonic()
        self.train_start_time = None
        self.train_start_step = None
        self.prev_time = None
        self.prev_step = None
        self.pause_start = None
        self.paused_time = 0.0
        self.accum_train_time = 0.0
        self.total_steps = None
        self.global_bs = None
        self.steps_per_epoch = None
        self.warmup_iters = 2  # ignore the first (compile) measurements
        self.note = ""

    def inform(self, *, total_steps=None, global_bs=None, steps_per_epoch=None,
               first_step=None):
        self.total_steps = total_steps if total_steps is not None else self.total_steps
        self.global_bs = global_bs or self.global_bs
        self.steps_per_epoch = steps_per_epoch or self.steps_per_epoch
        if first_step is not None:
            self.prev_step = first_step

    def tick(self, step: int, measure: Optional[Callable] = None,
             write_note: Optional[Callable] = None) -> dict:
        """Called each log step; returns (and optionally reports) metrics."""
        now = time.monotonic()
        metrics = {"uptime": now - self.program_start_time}

        if self.warmup_iters > 0:
            self.warmup_iters -= 1
            self.prev_time, self.prev_step = now, step
            self.train_start_time = now
            self.train_start_step = step
            if measure:
                for k, v in metrics.items():
                    measure(k, v)
            return metrics

        if self.prev_time is not None and step > self.prev_step:
            dt = now - self.prev_time - self.paused_time
            dstep = step - self.prev_step
            ncores = jax.device_count()
            if dt > 0:
                imgs_per_sec = self.global_bs * dstep / dt
                metrics["img/sec/core"] = imgs_per_sec / ncores
                metrics["img/sec"] = imgs_per_sec
            self.accum_train_time += dt
            devtype = jax.devices()[0].device_kind.replace(" ", "_")
            core_hours = self.accum_train_time * ncores / 3600
            metrics[f"core_hours_{devtype}"] = core_hours
            metrics["core_hours"] = core_hours

            if self.total_steps and "img/sec" in metrics:
                # smoothed over the whole (pause-corrected) run, not the
                # last tick — per-tick dt is too noisy for an ETA
                start = self.train_start_step or self.prev_step or 0
                done = max(step - start, dstep)
                eta = (self.total_steps - step) * (self.accum_train_time / done)
                metrics["eta_hours"] = eta / 3600

        metrics["examples_seen"] = (self.global_bs or 0) * step
        if self.steps_per_epoch:
            metrics["epoch"] = step / self.steps_per_epoch
        if self.total_steps:
            metrics["progress"] = step / self.total_steps

        self.prev_time, self.prev_step = now, step
        self.paused_time = 0.0
        if measure:
            for k, v in metrics.items():
                measure(k, v)
        return metrics

    def pause(self, wait_for=()):
        """Excludes eval/checkpoint time from throughput accounting."""
        jax.block_until_ready(wait_for)
        self.pause_start = time.monotonic()

    def resume(self):
        if self.pause_start is not None:
            self.paused_time += time.monotonic() - self.pause_start
            self.pause_start = None

    def save(self) -> dict:
        return {
            "accum_train_time": np.float64(self.accum_train_time),
        }

    def load(self, state: dict):
        self.accum_train_time = float(state.get("accum_train_time", 0.0))


chrono = Chrono()
