"""Structured JSONL metrics (SURVEY.md §5 "Metrics / logging").

Reference: stdout loss lines (+ maybe tf.summary). Build: structured JSONL
records (loss, throughput, step time, ...) written by host 0 only; the bench
harness consumes the same stream.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Optional, TextIO


class MetricsLogger:
    def __init__(self, path: str = "", enabled: bool = True):
        self.enabled = enabled
        self._file: Optional[TextIO] = None
        if enabled and path:
            self._file = open(path, "a")

    def log(self, **record) -> None:
        if not self.enabled:
            return
        record.setdefault("time", time.time())
        line = json.dumps(record)
        print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
