"""Structured JSONL metrics (SURVEY.md §5 "Metrics / logging").

Reference: stdout loss lines (+ maybe tf.summary). Build: structured JSONL
records (loss, throughput, step time, ...) written by host 0 only; the bench
harness consumes the same stream. An optional TensorBoard event stream
(SURVEY.md §5: "JSONL + optional TensorBoard writer") mirrors every numeric
field as a scalar; it is lazy-imported and silently disabled when the
tensorboard package is unavailable.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Optional, TextIO


class MetricsLogger:
    def __init__(
        self,
        path: str = "",
        enabled: bool = True,
        tensorboard_dir: str = "",
    ):
        self.enabled = enabled
        self._file: Optional[TextIO] = None
        self._tb = None
        if enabled and path:
            self._file = open(path, "a")
        if enabled and tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=tensorboard_dir)
            except Exception as e:  # pragma: no cover - optional dependency
                print(
                    f"metrics: tensorboard writer disabled ({e})",
                    file=sys.stderr,
                )

    def log(self, **record) -> None:
        if not self.enabled:
            return
        record.setdefault("time", time.time())
        line = json.dumps(record)
        print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._tb is not None:
            step = int(record.get("step", 0))
            for k, v in record.items():
                if k in ("step", "time"):
                    continue
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, global_step=step)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
