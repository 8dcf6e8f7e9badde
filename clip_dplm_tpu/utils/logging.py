"""Metric logging: CSV always, wandb when available (gated — not installed in
this image), python logging with file+stream handlers, and jax.profiler
trace hooks.

Covers the observability surface of SURVEY.md section 5: wandb init/log
(triple_flow/5_training.py:153-161, tong/experiments/train.py:20-24), logging
setup (triple_flow/1_config.py:275-284), CSV export
(tong/experiments/evaluate.py:59-66), and adds the profiler tracing the
reference lacked.
"""

from __future__ import annotations

import csv
import logging
import os
import time
from typing import Dict, Optional


def setup_logging(log_dir: str, name: str = "clip_dplm_tpu") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class MetricLogger:
    """CSV metric sink + optional wandb mirror + stdout."""

    def __init__(
        self,
        log_dir: str,
        use_wandb: bool = False,
        wandb_project: str = "clip-dplm-tpu",
        config: Optional[dict] = None,
        csv_name: str = "metrics.csv",
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.csv_path = os.path.join(log_dir, csv_name)
        self._csv_file = open(self.csv_path, "a", newline="")
        self._writer: Optional[csv.DictWriter] = None
        self.logger = setup_logging(log_dir)
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # gated: not installed in this image

                self._wandb = wandb
                wandb.init(project=wandb_project, config=config or {})
            except ImportError:
                self.logger.warning("wandb requested but not installed; CSV only")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, "time": time.time(), **{
            k: float(v) for k, v in metrics.items()
        }}
        if self._writer is None:
            self._writer = csv.DictWriter(self._csv_file, fieldnames=list(row))
            if self._csv_file.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._csv_file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._csv_file.close()
        if self._wandb is not None:
            self._wandb.finish()


class ProfilerHook:
    """jax.profiler trace around a step range (SURVEY.md section 5: the
    reference has no tracing; this writes TensorBoard-compatible traces)."""

    def __init__(self, profile_dir: str, start_step: int = 10, num_steps: int = 5):
        self.profile_dir = profile_dir
        self.start_step = start_step
        self.end_step = start_step + num_steps
        self._active = False

    def step(self, step: int) -> None:
        import jax

        if step == self.start_step and not self._active:
            os.makedirs(self.profile_dir, exist_ok=True)
            jax.profiler.start_trace(self.profile_dir)
            self._active = True
        elif step >= self.end_step and self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Per-step wall-clock timing with warmup skip (throughput accounting)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._last = None
        self._count = 0

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                dt = now - self._last
                self.times.append(dt)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return float(sum(self.times) / len(self.times)) if self.times else 0.0
