"""Logging + timing utilities (reference C14: colorlog ``log`` in util.py).

Provides the same surface the reference threads everywhere — ``log.info`` /
``log.warn`` / ``log.error`` plus step timers — with a structured JSONL metric
stream added for the rebuild's observability (SURVEY.md section 5).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def _build_logger() -> logging.Logger:
    logger = logging.getLogger("tpu_vqa")
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    handler = logging.StreamHandler(sys.stderr)
    try:
        import colorlog

        handler.setFormatter(
            colorlog.ColoredFormatter(
                "%(log_color)s[%(levelname).1s %(asctime)s]%(reset)s %(message)s",
                datefmt="%H:%M:%S",
            )
        )
    except ImportError:  # colorlog is optional in this image
        handler.setFormatter(
            logging.Formatter("[%(levelname).1s %(asctime)s] %(message)s",
                              datefmt="%H:%M:%S")
        )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


log = _build_logger()
# Reference-compatible alias: `log.warn` (TF1-era name).
if not hasattr(log, "warn"):
    log.warn = log.warning  # type: ignore[attr-defined]


class Timer:
    """Wall-clock step timer, context-manager or start/stop style."""

    def __init__(self) -> None:
        self._start = time.perf_counter()
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.elapsed = time.perf_counter() - self._start

    def reset(self) -> float:
        """Return seconds since last reset/start and restart the clock."""
        now = time.perf_counter()
        out = now - self._start
        self._start = now
        return out


class MetricWriter:
    """Structured metrics: JSONL always; TensorBoard if tensorflow is present.

    The reference wrote ``tf.summary`` scalars (loss/acc/lr) for TensorBoard;
    the JSONL stream is the rebuild's machine-readable equivalent.
    """

    def __init__(self, train_dir: str, use_tensorboard: bool = True) -> None:
        os.makedirs(train_dir, exist_ok=True)
        self._jsonl = open(os.path.join(train_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: F401

                self._tb = tf.summary.create_file_writer(
                    os.path.join(train_dir, "tb")
                )
            except Exception:  # tensorboard is a convenience, never required
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float],
              prefix: Optional[str] = None) -> None:
        record = {"step": int(step)}
        for k, v in metrics.items():
            key = f"{prefix}/{k}" if prefix else k
            record[key] = float(v)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in record.items():
                    if k != "step":
                        tf.summary.scalar(k, v, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
