"""Metric logging: console + JSONL + optional TensorBoard + pluggable sinks.

Replaces the reference's TensorBoard/Neptune PL loggers (SURVEY §5.5,
reference config/drift_eval_trainer.yaml:25-27 NeptuneLogger) with a
zero-dependency JSONL stream (the durable record) plus optional tf.summary
TensorBoard events when TensorFlow is importable. External experiment
trackers plug in as sinks: any object with ``log(metrics, step)`` (and
optionally ``close()``), instantiated from config via
``trainer.logger={_target_: my.module.MySink, ...}`` — the Neptune-shaped
extension point without the SDK dependency.
"""

import json
import logging
import os
import time
from typing import Any, Mapping, Optional, Sequence

LOGGER = logging.getLogger("fitclip_tpu")


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True,
                 sinks: Optional[Sequence[Any]] = None) -> None:
        self.log_dir = log_dir
        self.sinks = list(sinks or [])
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
        for sink in self.sinks:
            sink.log(scalars, step)
        LOGGER.info("step %d: %s", step,
                    " ".join(f"{k}={v:.5g}" for k, v in scalars.items()))

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        for sink in self.sinks:
            close = getattr(sink, "close", None)
            if close:
                close()
