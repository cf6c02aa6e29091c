"""command=tune: auto batch-size + learning-rate search (the PL
``trainer.tune()`` capability the reference exposes, __main__.py:55-63).

Two searches over the REAL jitted contrastive train step:

- **Batch-size scaling** (PL ``scale_batch_size`` power mode): double the
  batch until the step OOMs on the device or a trial cap is hit; suggest the
  last size that ran. One real batch is tiled to each candidate size, so the
  search measures exactly the memory profile of training.
- **LR range test** (PL ``lr_find`` / Leslie Smith): one jitted step whose
  AdamW learning rate is a geometric per-step schedule lr_min -> lr_max;
  run it over real batches, smooth the loss, stop on divergence (loss >
  4x best), and suggest the LR at the steepest descent of the smoothed curve.

The schedule trick matters on TPU: the LR is a function of the step counter
already carried in the optimizer state, so the whole sweep is ONE compile
instead of one per candidate LR.
"""

import logging
import math
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

from fitclip_tpu.parallel import create_mesh, replicated
from fitclip_tpu.training.state import init_train_state, make_optimizer
from fitclip_tpu.training.steps import make_contrastive_train_step

LOGGER = logging.getLogger(__name__)


def _first_batch(data_module) -> Dict[str, np.ndarray]:
    for batch in data_module.train_dataloader():
        video = batch.get("video", batch.get("video_student"))
        text = batch.get("text", batch.get("text_student"))
        if video is None or text is None:
            raise ValueError("tune needs a video+text train batch; got keys "
                             f"{sorted(batch)}")
        return {"video": np.asarray(video), "text": np.asarray(text)}
    raise ValueError("empty train dataloader")


def _tile_to(batch: Mapping[str, np.ndarray], size: int) -> Dict[str, np.ndarray]:
    out = {}
    for key, value in batch.items():
        reps = -(-size // value.shape[0])  # ceil
        tiled = np.concatenate([value] * reps, axis=0)[:size]
        out[key] = tiled
    return out


def _is_oom(error: Exception) -> bool:
    text = str(error)
    return ("RESOURCE_EXHAUSTED" in text or "Out of memory" in text
            or "out of memory" in text.lower())


def scale_batch_size(encoder_loaded, batch: Mapping[str, np.ndarray],
                     init_size: int = 2, max_trials: int = 8,
                     mesh=None) -> int:
    """Doubling search: largest batch size whose train step executes."""
    mesh = mesh or create_mesh()
    optimizer = make_optimizer(1e-4)
    state = init_train_state(encoder_loaded.params, optimizer)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_contrastive_train_step(encoder_loaded.encoder, optimizer))

    best = 0
    size = init_size
    for _ in range(max_trials):
        candidate = _tile_to(batch, size)
        try:
            _, metrics = step(state, candidate)
            jax.block_until_ready(metrics["loss/train"])
        except Exception as error:  # noqa: BLE001 - OOM classification below
            if _is_oom(error):
                LOGGER.info("batch_size=%d OOM; stopping search", size)
                break
            raise
        best = size
        LOGGER.info("batch_size=%d fits", size)
        size *= 2
    return best


def lr_find(encoder_loaded, data_module, lr_min: float = 1e-8,
            lr_max: float = 1.0, num_steps: int = 100,
            smoothing: float = 0.05, diverge_factor: float = 4.0,
            mesh=None) -> Dict[str, Any]:
    """LR range test; returns {"lr": suggestion, "losses": [...], "lrs": [...]}."""
    mesh = mesh or create_mesh()
    ratio = (lr_max / lr_min) ** (1.0 / max(num_steps - 1, 1))

    def schedule(count):
        return lr_min * ratio ** count

    optimizer = make_optimizer(schedule)
    state = init_train_state(encoder_loaded.params, optimizer)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_contrastive_train_step(encoder_loaded.encoder, optimizer))

    losses, lrs = [], []
    smoothed = None
    best = math.inf
    i = 0
    while i < num_steps:
        for batch in data_module.train_dataloader():
            if i >= num_steps:
                break
            video = batch.get("video", batch.get("video_student"))
            text = batch.get("text", batch.get("text_student"))
            state, metrics = step(state, {"video": np.asarray(video),
                                          "text": np.asarray(text)})
            loss = float(metrics["loss/train"])
            if not math.isfinite(loss):
                LOGGER.info("lr_find: non-finite loss at lr=%.3g; stopping",
                            schedule(i))
                i = num_steps
                break
            smoothed = loss if smoothed is None else (
                smoothing * loss + (1 - smoothing) * smoothed)
            losses.append(smoothed)
            lrs.append(float(schedule(i)))
            best = min(best, smoothed)
            if smoothed > diverge_factor * best and i > num_steps // 10:
                LOGGER.info("lr_find: diverged at lr=%.3g (loss %.3g > %gx best)",
                            lrs[-1], smoothed, diverge_factor)
                i = num_steps
                break
            i += 1
        else:
            continue
        break

    if len(losses) < 3:
        raise ValueError("lr_find collected too few points; is the train "
                         "dataloader empty?")
    # PL suggestion(): LR at the steepest negative gradient of the smoothed
    # loss, skipping the leading/trailing few points.
    gradient = np.gradient(np.asarray(losses))
    skip = max(1, len(losses) // 10)
    window = gradient[skip:len(gradient) - skip or None]
    suggestion_index = int(np.argmin(window)) + skip
    return {"lr": lrs[suggestion_index], "losses": losses, "lrs": lrs}


def run_tune(encoder_slot, data_module, trainer_cfg: Mapping[str, Any],
             tune_cfg: Optional[Mapping[str, Any]] = None,
             mesh=None) -> Dict[str, Any]:
    """Returns {"batch_size": int, "lr": float} suggestions (printed by the
    CLI). Reference: trainer.tune() under command=tune, __main__.py:55-63
    (which asserts no resume checkpoint — enforced by the caller)."""
    if isinstance(encoder_slot, Mapping):
        raise ValueError(
            "command=tune expects a single encoder; for teacher-student runs "
            "tune the student encoder alone (encoder=<student config>)")
    tune_cfg = dict(tune_cfg or {})
    mesh = mesh or create_mesh()

    results: Dict[str, Any] = {}
    if tune_cfg.get("scale_batch_size", True):
        batch = _first_batch(data_module)
        results["batch_size"] = scale_batch_size(
            encoder_slot, batch,
            init_size=int(tune_cfg.get("init_batch_size", 2)),
            max_trials=int(tune_cfg.get("max_trials", 8)), mesh=mesh)
    if tune_cfg.get("lr_find", True):
        found = lr_find(
            encoder_slot, data_module,
            lr_min=float(tune_cfg.get("lr_min", 1e-8)),
            lr_max=float(tune_cfg.get("lr_max", 1.0)),
            num_steps=int(tune_cfg.get("num_lr_steps", 100)), mesh=mesh)
        results["lr"] = found["lr"]
    return results
