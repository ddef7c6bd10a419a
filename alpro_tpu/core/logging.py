"""Logging / metering utilities.

Equivalent surface to the reference's `src/utils/logger.py` (LOGGER singleton,
`TB_LOGGER` scalar writer with an internal global step, `RunningMeter` EWMA
loss smoothing, `NoOp` for non-zero ranks) — but the scalar sink is a JSONL
metrics file (readable anywhere) instead of tensorboardX.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

_LOG_FMT = "%(asctime)s - %(levelname)s - %(name)s -   %(message)s"
_DATE_FMT = "%m/%d/%Y %H:%M:%S"
logging.basicConfig(format=_LOG_FMT, datefmt=_DATE_FMT, level=logging.INFO)
LOGGER = logging.getLogger("alpro_tpu")


def add_log_to_file(log_path: str) -> None:
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    fh = logging.FileHandler(log_path)
    fh.setFormatter(logging.Formatter(_LOG_FMT, datefmt=_DATE_FMT))
    LOGGER.addHandler(fh)


class MetricsLogger:
    """Scalar logger with an internal global step (reference: TB_LOGGER,
    `src/utils/logger.py:22-64`). Writes JSONL rows {step, key, value, ts}."""

    def __init__(self):
        self._path: Optional[str] = None
        self._fh = None
        self._global_step = 0

    def create(self, output_dir: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        self._path = os.path.join(output_dir, "metrics.jsonl")
        self._fh = open(self._path, "a")

    @property
    def global_step(self) -> int:
        return self._global_step

    def step(self) -> None:
        self._global_step += 1

    def add_scalar(self, key: str, value, step: Optional[int] = None) -> None:
        if self._fh is None:
            return
        row = {
            "step": self._global_step if step is None else step,
            "key": key,
            "value": float(value),
            "ts": time.time(),
        }
        self._fh.write(json.dumps(row) + "\n")

    def log_scalar_dict(self, log_dict, prefix: str = "") -> None:
        if self._fh is None:
            return
        prefix = prefix + "_" if prefix and not prefix.endswith("_") else prefix
        for k, v in log_dict.items():
            self.add_scalar(prefix + k, v)
        self._fh.flush()

    def flush(self) -> None:
        if self._fh is not None:
            self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


TB_LOGGER = MetricsLogger()


class RunningMeter:
    """EWMA smoothing of a scalar series (reference `logger.py:67-89`)."""

    def __init__(self, name: str, val: Optional[float] = None, smooth: float = 0.99):
        self._name = name
        self._sm = smooth
        self._val = val

    def __call__(self, value: float) -> None:
        value = float(value)
        if value != value:  # skip nan
            return
        self._val = (
            value
            if self._val is None
            else self._val * self._sm + value * (1 - self._sm)
        )

    def __str__(self) -> str:
        return f"{self._name}: {self._val:.4f}"

    @property
    def val(self) -> Optional[float]:
        return self._val

    @property
    def name(self) -> str:
        return self._name


class NoOp:
    """Swallows every call — used on non-zero hosts (reference `logger.py:92`)."""

    def __getattr__(self, _name):
        return self.noop

    def noop(self, *args, **kwargs):
        return
