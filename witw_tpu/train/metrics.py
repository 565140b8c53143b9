"""Metrics/observability: TensorBoard-compatible writer + JSONL log.

The reference logs per-step prints and TensorBoard scalars/embeddings/text
(reference model/cvig_fov.py:388,467-471,569-575). This writer emits
TensorBoard events when tensorboardX is available and always appends a JSONL
stream (machine-readable observability the reference lacks, SURVEY.md §5.5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricWriter:
    def __init__(self, logdir: str, jsonl: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a") if jsonl else None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "tag": tag, "value": float(value), "step": step})
                + "\n"
            )

    def text(self, tag: str, value: str, step: int = 0) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "tag": tag, "text": value, "step": step}) + "\n"
            )

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
