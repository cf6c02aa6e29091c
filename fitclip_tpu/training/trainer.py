"""The outer training loop: epochs, periodic validation, callbacks.

Everything PL's Trainer did for the reference that still matters TPU-side:
- periodic validation at ``val_check_interval`` (fraction of an epoch, e.g.
  0.02 in teacher_student_trainer.yaml:16);
- checkpoint cadence: best-by-monitor, every-N-epochs, wall-clock interval
  (config/trainer/callbacks/default.yaml semantics);
- early stopping on a monitored metric;
- metric logging per step.

The device work is one jitted step; this loop is plain Python on the host.
"""

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import numpy as np

from fitclip_tpu.training.checkpointing import save_checkpoint, save_trainer_state
from fitclip_tpu.training.state import TrainState
from fitclip_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass
class EarlyStoppingConfig:
    monitor: str = "loss/val"
    mode: str = "min"
    patience: int = 3
    min_delta: float = 0.0


@dataclasses.dataclass
class CheckpointConfig:
    dirpath: str = "checkpoints"
    monitor: Optional[str] = "loss/val"
    mode: str = "min"
    every_n_epochs: Optional[int] = 5
    train_time_interval_seconds: Optional[float] = 3600.0


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 1
    val_check_interval: float = 1.0
    log_every_n_steps: int = 10
    early_stopping: Optional[EarlyStoppingConfig] = None
    checkpoint: Optional[CheckpointConfig] = None
    max_steps: Optional[int] = None


class _EarlyStopping:
    def __init__(self, config: EarlyStoppingConfig):
        self.config = config
        self.best = np.inf if config.mode == "min" else -np.inf
        self.bad_checks = 0

    def update(self, metrics: Mapping[str, float]) -> bool:
        """Returns True if training should stop."""
        value = metrics.get(self.config.monitor)
        if value is None:
            return False
        improved = (value < self.best - self.config.min_delta
                    if self.config.mode == "min"
                    else value > self.best + self.config.min_delta)
        if improved:
            self.best = value
            self.bad_checks = 0
        else:
            self.bad_checks += 1
        return self.bad_checks > self.config.patience


class Trainer:
    def __init__(self, config: TrainerConfig,
                 logger: Optional[MetricsLogger] = None,
                 prepare_batch: Optional[Callable[[Any], Any]] = None) -> None:
        self.config = config
        self.logger = logger or MetricsLogger()
        self.prepare_batch = prepare_batch or (lambda batch: batch)

    def fit(self,
            state: TrainState,
            train_step: Callable,
            train_loader,
            validate: Optional[Callable[[TrainState], Dict[str, float]]] = None,
            teacher_params: Any = None,
            resume_trainer_state: Optional[Mapping[str, Any]] = None) -> TrainState:
        config = self.config
        early_stopping = (_EarlyStopping(config.early_stopping)
                          if config.early_stopping else None)
        ckpt = config.checkpoint
        last_time_ckpt = time.time()
        # Donate the TrainState: params + AdamW moments update in place, so
        # HBM holds one state copy instead of old+new across the step (the
        # difference between fitting and OOMing a larger tower/batch on one
        # chip). The loop rebinds `state` to the step output immediately, so
        # the donated input is never touched again. CPU/interpret backends
        # don't implement donation — skip to avoid a per-compile warning.
        donate = (0,) if jax.default_backend() in ("tpu", "gpu") else ()
        jitted = jax.jit(train_step, donate_argnums=donate)
        global_step = int(state.step)
        stop = False

        # Restore callback state saved alongside a full-TrainState checkpoint
        # (PL persists callback state inside its checkpoints; ours rides a
        # JSON sidecar — training/checkpointing.py).
        if resume_trainer_state:
            if resume_trainer_state.get("best_monitor") is not None:
                self._best_monitor = resume_trainer_state["best_monitor"]
            if early_stopping and "early_stopping_best" in resume_trainer_state:
                early_stopping.best = resume_trainer_state["early_stopping_best"]
                early_stopping.bad_checks = resume_trainer_state.get(
                    "early_stopping_bad_checks", 0)
        self._early_stopping = early_stopping

        for epoch in range(config.max_epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            steps_per_epoch = len(train_loader) if hasattr(train_loader, "__len__") else None
            val_every = (max(1, int(steps_per_epoch * config.val_check_interval))
                         if steps_per_epoch and config.val_check_interval < 1 else None)

            # Resume fast-forward: epochs fully covered by the restored step
            # are skipped outright; a partially covered epoch re-iterates its
            # loader (same epoch seed -> same order) and discards the batches
            # already trained on, so 4 steps + resume + 4 steps consumes the
            # exact sample stream of 8 straight steps.
            skip_batches = 0
            if steps_per_epoch and global_step > epoch * steps_per_epoch:
                if global_step >= (epoch + 1) * steps_per_epoch:
                    continue
                skip_batches = global_step - epoch * steps_per_epoch

            for batch in train_loader:
                if skip_batches:
                    skip_batches -= 1
                    continue
                batch = self.prepare_batch(batch)
                if teacher_params is not None:
                    state, metrics = jitted(state, teacher_params, batch)
                else:
                    state, metrics = jitted(state, batch)
                global_step += 1

                if global_step % config.log_every_n_steps == 0:
                    self._log({k: float(v) for k, v in metrics.items()},
                              global_step)

                if val_every and global_step % val_every == 0 and validate:
                    stop = self._validate_and_callbacks(
                        state, validate, early_stopping, ckpt, global_step)
                    if stop:
                        break

                if (ckpt and ckpt.train_time_interval_seconds
                        and time.time() - last_time_ckpt > ckpt.train_time_interval_seconds):
                    self._save(state, os.path.join(ckpt.dirpath, "time_interval"))
                    last_time_ckpt = time.time()

                if config.max_steps and global_step >= config.max_steps:
                    stop = True
                    break
            if stop:
                break

            # Epoch-end validation (when not doing intra-epoch checks).
            if validate and not val_every:
                stop = self._validate_and_callbacks(state, validate, early_stopping,
                                                    ckpt, global_step)
            if ckpt and ckpt.every_n_epochs and (epoch + 1) % ckpt.every_n_epochs == 0:
                self._save(state, os.path.join(ckpt.dirpath, f"epoch_{epoch + 1}"))
            if stop:
                break

        if ckpt:
            self._save(state, os.path.join(ckpt.dirpath, "last"))
        # Drain the async writer: callers may read "last" immediately.
        from fitclip_tpu.training.checkpointing import wait_for_checkpoints

        wait_for_checkpoints()
        return state

    def _log(self, metrics, step) -> None:
        from fitclip_tpu.parallel.multihost import is_main_process

        if is_main_process():
            self.logger.log(metrics, step=step)

    def _validate_and_callbacks(self, state, validate, early_stopping, ckpt,
                                global_step) -> bool:
        metrics = validate(state)
        self._log(metrics, global_step)
        if ckpt and ckpt.monitor and ckpt.monitor in metrics:
            value = metrics[ckpt.monitor]
            best = getattr(self, "_best_monitor", None)
            better = (best is None or
                      (value < best if ckpt.mode == "min" else value > best))
            if better:
                self._best_monitor = value
                self._save(state, os.path.join(ckpt.dirpath, "best"))
        self._last_val_metrics = metrics
        return early_stopping.update(metrics) if early_stopping else False

    def _save(self, state: TrainState, path: str) -> None:
        from fitclip_tpu.parallel.multihost import is_main_process

        if not is_main_process():
            return
        # Async write: device_get snapshots to host (the step donates device
        # buffers), then training overlaps the Orbax flush.
        save_checkpoint(path, jax.device_get(state), wait=False)
        trainer_state: Dict[str, Any] = {}
        if getattr(self, "_best_monitor", None) is not None:
            trainer_state["best_monitor"] = float(self._best_monitor)
        early = getattr(self, "_early_stopping", None)
        if early is not None:
            trainer_state["early_stopping_best"] = float(early.best)
            trainer_state["early_stopping_bad_checks"] = int(early.bad_checks)
        if trainer_state:
            save_trainer_state(path, trainer_state)
