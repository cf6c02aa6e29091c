"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

What the reference never had (SURVEY §4): distributed logic exercised in tests.
Checks that the global-batch contrastive loss under a sharded mesh equals the
single-device computation, and that the teacher-student step runs sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fitclip_tpu.models.clip import CLIPConfig
from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
from fitclip_tpu.parallel import create_mesh, replicated, shard_batch
from fitclip_tpu.training.state import init_train_state, make_optimizer
from fitclip_tpu.training.steps import (
    make_contrastive_train_step, make_eval_step, make_teacher_student_train_step)


@pytest.fixture(scope="module")
def encoder():
    return ClipVideoTextEncoder(CLIPConfig.tiny_test(), num_frames=2)


@pytest.fixture(scope="module")
def params(encoder):
    return encoder.init_params(jax.random.PRNGKey(0))


def _batch(rng, n, encoder):
    size = encoder.config.vision.image_size
    length = encoder.config.text.context_length
    return {
        "video": rng.normal(size=(n, encoder.num_frames, size, size, 3)).astype(np.float32),
        "text": rng.integers(1, 64, size=(n, length)).astype(np.int32),
    }


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_train_step_matches_single_device(encoder, params):
    optimizer = make_optimizer(1e-3)
    state = init_train_state(params, optimizer)
    step = make_contrastive_train_step(encoder, optimizer)
    batch = _batch(np.random.default_rng(0), 16, encoder)

    # Single device (no sharding).
    _, metrics_single = jax.jit(step)(state, jax.tree_util.tree_map(jnp.asarray, batch))

    # Sharded over the 8-device data mesh.
    mesh = create_mesh()
    sharded_batch = shard_batch(batch, mesh)
    state_sharded = jax.device_put(state, replicated(mesh))
    new_state, metrics_sharded = jax.jit(step)(state_sharded, sharded_batch)

    assert float(metrics_sharded["loss/train"]) == pytest.approx(
        float(metrics_single["loss/train"]), rel=1e-4)
    assert int(new_state.step) == 1
    # logit scale actually updated (temperature is trainable by default)
    assert float(new_state.params["logit_scale"][0]) != float(state.params["logit_scale"][0])


def test_teacher_student_sharded_step(encoder, params):
    optimizer = make_optimizer(1e-3)
    state = init_train_state(params, optimizer, with_teacher_student_scale=True)
    teacher_params = encoder.init_params(jax.random.PRNGKey(1))
    step = make_teacher_student_train_step(encoder, encoder, optimizer,
                                           labeled_loss_share=0.9999)
    rng = np.random.default_rng(1)

    def sub(n):
        b = _batch(rng, n, encoder)
        return {"video_student": b["video"], "text_student": b["text"],
                "video_teacher": b["video"], "text_teacher": b["text"]}

    batch = {"labeled": sub(8), "unlabeled": sub(8)}
    mesh = create_mesh()
    sharded = shard_batch(batch, mesh)
    state = jax.device_put(state, replicated(mesh))
    teacher_params = jax.device_put(teacher_params, replicated(mesh))

    new_state, metrics = jax.jit(step)(state, teacher_params, sharded)
    assert np.isfinite(float(metrics["loss/train"]))
    assert np.isfinite(float(metrics["loss/train_labeled"]))
    assert np.isfinite(float(metrics["loss/train_unlabeled"]))
    # Teacher equals init; student got an update.
    delta = jax.tree_util.tree_reduce(
        lambda acc, pair: acc + float(jnp.abs(pair).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b,
                               new_state.params["encoder"], state.params["encoder"]),
        0.0)
    assert delta > 0


def test_frozen_text_tower_gets_no_updates(encoder, params):
    optimizer = make_optimizer(1e-2, freeze_patterns=[r"^encoder/text/"],
                               params_example={"encoder": params,
                                               "logit_scale": jnp.zeros((1,))})
    state = init_train_state(params, optimizer)
    step = make_contrastive_train_step(encoder, optimizer)
    batch = jax.tree_util.tree_map(jnp.asarray, _batch(np.random.default_rng(2), 8, encoder))
    new_state, _ = jax.jit(step)(state, batch)

    text_delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.params["encoder"]["text"],
                               state.params["encoder"]["text"]), 0.0)
    visual_delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.params["encoder"]["visual"],
                               state.params["encoder"]["visual"]), 0.0)
    assert text_delta == 0.0
    assert visual_delta > 0.0


def test_eval_step_sharded(encoder, params):
    mesh = create_mesh()
    step = jax.jit(make_eval_step(encoder))
    batch = shard_batch(_batch(np.random.default_rng(3), 16, encoder), mesh)
    v, t = step(jax.device_put(params, replicated(mesh)), batch)
    assert v.shape == (16, encoder.config.embed_dim)
    norms = np.linalg.norm(np.asarray(t), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
