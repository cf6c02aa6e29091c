"""Metric logging: console + JSONL + optional TensorBoard.

Replaces the reference's TensorBoard/Neptune PL loggers (SURVEY §5.5) with a
zero-dependency JSONL stream (the durable record) plus optional tf.summary
TensorBoard events when TensorFlow is importable.
"""

import json
import logging
import os
import time
from typing import Mapping, Optional

LOGGER = logging.getLogger("fitclip_tpu")


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True) -> None:
        self.log_dir = log_dir
        self._jsonl = None
        self._tb_writer = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    import tensorflow as tf

                    self._tb_writer = tf.summary.create_file_writer(log_dir)
                except Exception:
                    self._tb_writer = None

    def log(self, metrics: Mapping[str, float], step: int, prefix: str = "") -> None:
        scalars = {f"{prefix}{k}": float(v) for k, v in metrics.items()}
        entry = {"step": int(step), "time": time.time(), **scalars}
        if self._jsonl:
            self._jsonl.write(json.dumps(entry) + "\n")
            self._jsonl.flush()
        if self._tb_writer:
            import tensorflow as tf

            with self._tb_writer.as_default():
                for key, value in scalars.items():
                    tf.summary.scalar(key, value, step=step)
            self._tb_writer.flush()
        LOGGER.info("step %d: %s", step,
                    " ".join(f"{k}={v:.5g}" for k, v in scalars.items()))

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
