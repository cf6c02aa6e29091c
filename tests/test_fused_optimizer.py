"""FusedAdamW (single-HBM-pass update) vs the optax chain it replaces.

The fused path must be numerically interchangeable with
make_optimizer(fused=False) — same AdamW math (bias correction on count+1,
eps outside the sqrt, decoupled weight decay), same freeze semantics (hard
zeros, no moments), same trainable-only global-norm clipping, same schedule
stepping — so flipping the flag never changes training trajectories beyond
float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.training.state import (TrainState, apply_updates_with_clamp,
                                        init_train_state, make_optimizer)


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "encoder": {
            "text": {"w": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
                     "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
            "visual": {"w": jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)},
        },
        "logit_scale": jnp.asarray(rng.normal(size=(1,)), jnp.float32),
    }


def _grads(step, seed=1):
    rng = np.random.default_rng(seed + step)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype), _params())


def _run(optimizer, steps=5, scale=1.0):
    params = _params()
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       max_logit_scale=jnp.full((1,), 10.0))
    for step in range(steps):
        grads = jax.tree_util.tree_map(lambda g: g * scale, _grads(step))
        state = apply_updates_with_clamp(state, grads, optimizer)
    return state


def _assert_trees_close(a, b, rtol=2e-5, atol=1e-7):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                rtol=rtol, atol=atol), a, b)


@pytest.mark.parametrize("weight_decay,eps", [(0.01, 1e-8), (0.1, 1e-6)])
def test_fused_matches_optax(weight_decay, eps):
    kwargs = dict(weight_decay=weight_decay, eps=eps, betas=(0.9, 0.98))
    ref = _run(make_optimizer(3e-4, **kwargs))
    fused = _run(make_optimizer(3e-4, fused=True, **kwargs))
    _assert_trees_close(ref.params, fused.params)
    assert int(fused.opt_state["count"]) == 5


def test_fused_freeze_is_hard_zero():
    kwargs = dict(freeze_patterns=[r"^encoder/text/"],
                  params_example=_params())
    ref = _run(make_optimizer(1e-3, **kwargs))
    fused = _run(make_optimizer(1e-3, fused=True, **kwargs))
    start = _params()
    # Frozen subtree bit-identical to its start value on both paths.
    for got in (ref, fused):
        _assert_trees_close(got.params["encoder"]["text"],
                            start["encoder"]["text"], rtol=0, atol=0)
    _assert_trees_close(ref.params, fused.params)
    # Frozen leaves carry scalar placeholders, not full zero moments.
    assert fused.opt_state["mu"]["encoder"]["text"]["w"].shape == ()


def test_fused_global_norm_clip_matches():
    kwargs = dict(gradient_clip_val=0.5)
    ref = _run(make_optimizer(1e-3, **kwargs), scale=100.0)
    fused = _run(make_optimizer(1e-3, fused=True, **kwargs), scale=100.0)
    _assert_trees_close(ref.params, fused.params)


def test_fused_schedule_matches():
    schedule = lambda count: 1e-3 / (1.0 + count.astype(jnp.float32))  # noqa: E731
    ref = _run(make_optimizer(schedule))
    fused = _run(make_optimizer(schedule, fused=True))
    _assert_trees_close(ref.params, fused.params)


def test_fused_temperature_clamp_applies():
    optimizer = make_optimizer(10.0, fused=True, weight_decay=0.0)
    params = _params()
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       max_logit_scale=jnp.full((1,), 0.1))
    grads = jax.tree_util.tree_map(lambda p: -jnp.ones_like(p), params)
    state = apply_updates_with_clamp(state, grads, optimizer)
    assert float(state.params["logit_scale"][0]) == pytest.approx(0.1)


def test_fused_through_train_step():
    from fitclip_tpu.models.clip.load import load_tiny_test_encoder
    from fitclip_tpu.training.steps import make_contrastive_train_step

    enc = load_tiny_test_encoder()
    batch = {
        "video": jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 2, enc.encoder.config.vision.image_size,
                  enc.encoder.config.vision.image_size, 3)), jnp.float32),
        "text": jnp.asarray(np.random.default_rng(1).integers(
            1, 64, size=(2, enc.encoder.config.text.context_length)), jnp.int32),
    }

    def train(fused):
        optimizer = make_optimizer(1e-3, fused=fused)
        state = init_train_state(enc.params, optimizer)
        step = jax.jit(make_contrastive_train_step(enc.encoder, optimizer))
        for _ in range(2):
            state, metrics = step(state, batch)
        return state, metrics

    ref_state, ref_metrics = train(False)
    fused_state, fused_metrics = train(True)
    np.testing.assert_allclose(float(ref_metrics["loss/train"]),
                               float(fused_metrics["loss/train"]), rtol=1e-5)
    _assert_trees_close(ref_state.params, fused_state.params, rtol=5e-5,
                        atol=1e-6)


def test_bf16_moments_state_dtype_and_update_math():
    """moment_dtype=bfloat16 stores m/v reduced; the update math still runs
    fp32 (upcast in-fusion), so a single step from zero moments is close to
    the fp32-moment step (the only narrowing is the stored state)."""
    ref_opt = make_optimizer(3e-4, fused=True)
    bf_opt = make_optimizer(3e-4, fused=True, moment_dtype="bfloat16")
    params = _params()
    opt_state = bf_opt.init(params)
    assert opt_state["mu"]["encoder"]["text"]["w"].dtype == jnp.bfloat16
    assert opt_state["nu"]["encoder"]["visual"]["w"].dtype == jnp.bfloat16

    ref = _run(ref_opt, steps=1)
    got = _run(bf_opt, steps=1)
    # Step 1 params differ only through the bf16 rounding of the STORED
    # moments feeding step 2 — the applied update itself is fp32.
    _assert_trees_close(ref.params, got.params, rtol=1e-5, atol=1e-6)


def test_bf16_moments_loss_trajectory_parity():
    """The VERDICT r4 #4 gate: N-step contrastive training with bf16 moments
    must track the fp32-moment loss trajectory. Tolerance is loose (the
    moment rounding feeds back into the params) but catches divergence or a
    broken update."""
    from fitclip_tpu.models.clip.load import load_tiny_test_encoder
    from fitclip_tpu.training.steps import make_contrastive_train_step

    enc = load_tiny_test_encoder()
    size = enc.encoder.config.vision.image_size
    length = enc.encoder.config.text.context_length
    rng = np.random.default_rng(0)
    batches = [{
        "video": jnp.asarray(rng.normal(size=(2, 2, size, size, 3)),
                             jnp.float32),
        "text": jnp.asarray(rng.integers(1, 64, size=(2, length)), jnp.int32),
    } for _ in range(8)]

    def train(moment_dtype):
        optimizer = make_optimizer(1e-3, fused=True,
                                   moment_dtype=moment_dtype)
        state = init_train_state(enc.params, optimizer)
        step = jax.jit(make_contrastive_train_step(enc.encoder, optimizer))
        losses = []
        for batch in batches:
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss/train"]))
        return np.asarray(losses)

    ref_losses = train(None)
    bf_losses = train("bfloat16")
    np.testing.assert_allclose(bf_losses, ref_losses, rtol=2e-2, atol=2e-2)
