"""Train state: trainable pytree + optimizer + learnable temperature(s).

Reference semantics re-expressed functionally:
- ``logit_scale`` starts at -log(init_temperature) and is clamped to
  -log(min_temperature) after every optimizer step
  (aligner/video_text_module.py:26-35,93-97).
- The teacher-student variant carries a second scale with the same clamp
  (aligner/teacher_student.py:70-73,190-194).
- Parameter freezing by regex over parameter paths replaces the ParamFreezer
  callback (aligner/param_freezer.py:12-42) with an optax mask: frozen leaves
  get zero updates, so they also never allocate optimizer moments.
"""

import math
import re
from typing import Any, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

Params = Any


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Params  # {"encoder": ..., "logit_scale": (1,), ["ts_logit_scale": (1,)]}
    opt_state: Any
    max_logit_scale: jnp.ndarray  # static clamp bound, kept with the state

    def temperature(self) -> jnp.ndarray:
        return 1.0 / jnp.exp(self.params["logit_scale"])


def param_path_strings(params: Params) -> Sequence[str]:
    flat = jax.tree_util.tree_leaves_with_path(params)
    return ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat]


def freeze_mask(params: Params, patterns: Sequence[str]) -> Params:
    """True = trainable, False = frozen. Patterns are regexes matched with
    `re.search` against slash-joined parameter paths."""
    compiled = [re.compile(p) for p in patterns]
    unused = set(range(len(compiled)))

    def decide(path, _):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        for i, pattern in enumerate(compiled):
            if pattern.search(path_str):
                unused.discard(i)
                return False
        return True

    mask = jax.tree_util.tree_map_with_path(decide, params)
    for i in sorted(unused):
        import logging
        logging.getLogger(__name__).warning(
            "Freeze pattern %r matched no parameters", patterns[i])
    return mask


def make_optimizer(learning_rate, weight_decay: float = 0.01,
                   betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
                   freeze_patterns: Optional[Sequence[str]] = None,
                   fit_temperature: bool = True,
                   gradient_clip_val: Optional[float] = None,
                   params_example: Optional[Params] = None) -> optax.GradientTransformation:
    """AdamW matching the reference default optimizer (config/trainer.yaml:
    torch.optim.AdamW, lr 3e-6), with optional global-norm clipping (the
    reference sweeps trainer.gradient_clip_val)."""
    chain = []
    if gradient_clip_val:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))
    chain.append(optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                             weight_decay=weight_decay))
    optimizer = optax.chain(*chain)

    patterns = list(freeze_patterns or [])
    if not fit_temperature:
        patterns.append(r"^(ts_)?logit_scale$")
    if patterns:
        if params_example is None:
            raise ValueError("freeze_patterns requires params_example to build the mask")
        mask = freeze_mask(params_example, patterns)
        labels = jax.tree_util.tree_map(lambda trainable: "train" if trainable else "freeze", mask)
        # NOT optax.masked: masked passes untouched leaves' raw gradients
        # through as updates; frozen leaves need hard zeros.
        optimizer = optax.multi_transform({"train": optimizer, "freeze": optax.set_to_zero()},
                                          labels)
    return optimizer


def init_train_state(encoder_params: Params, optimizer: optax.GradientTransformation,
                     init_temperature: float = 0.05, min_temperature: float = 0.001,
                     with_teacher_student_scale: bool = False) -> TrainState:
    params = {
        "encoder": encoder_params,
        "logit_scale": jnp.full((1,), -math.log(init_temperature), jnp.float32),
    }
    if with_teacher_student_scale:
        params["ts_logit_scale"] = jnp.full((1,), -math.log(init_temperature), jnp.float32)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        max_logit_scale=jnp.full((1,), -math.log(min_temperature), jnp.float32),
    )


def apply_updates_with_clamp(state: TrainState, grads: Params,
                             optimizer: optax.GradientTransformation) -> TrainState:
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # Temperature clamp: logit_scale <= max_logit_scale, applied post-step
    # exactly like the reference optimizer_step override.
    new_params["logit_scale"] = jnp.minimum(new_params["logit_scale"], state.max_logit_scale)
    if "ts_logit_scale" in new_params:
        new_params["ts_logit_scale"] = jnp.minimum(new_params["ts_logit_scale"],
                                                   state.max_logit_scale)
    return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt_state)
