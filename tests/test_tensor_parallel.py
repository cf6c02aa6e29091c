"""Tensor-parallel sharding: a (data=4, model=2) mesh must reproduce the
single-device loss and actually shard the big kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.models.clip import CLIPConfig
from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
from fitclip_tpu.parallel.mesh import create_mesh, sharded_along
from fitclip_tpu.parallel.sharding_rules import shard_params, tensor_parallel_shardings
from fitclip_tpu.training.state import init_train_state, make_optimizer
from fitclip_tpu.training.steps import make_contrastive_train_step


@pytest.fixture(scope="module")
def mesh_2d():
    devices = np.asarray(jax.devices()).reshape(4, 2)
    return create_mesh(devices, axis_names=("data", "model"))


@pytest.fixture(scope="module")
def encoder():
    return ClipVideoTextEncoder(CLIPConfig.tiny_test(), num_frames=2)


def test_sharding_rules_split_big_kernels(encoder, mesh_2d):
    params = encoder.init_params(jax.random.PRNGKey(0))
    shardings = tensor_parallel_shardings(params, mesh_2d)
    mlp_fc = shardings["visual"]["transformer"]["blocks"]["mlp_fc"]["kernel"]
    assert "model" in str(mlp_fc.spec)
    ln = shardings["visual"]["ln_pre"]["ln"]["scale"]
    assert ln.spec == jax.sharding.PartitionSpec()

    sharded = shard_params(params, mesh_2d)
    kernel = sharded["visual"]["transformer"]["blocks"]["mlp_fc"]["kernel"]
    # Each model shard holds half the hidden dim.
    shard_shape = kernel.sharding.shard_shape(kernel.shape)
    assert shard_shape[-1] == kernel.shape[-1] // 2


def test_tp_train_step_matches_single_device(encoder, mesh_2d):
    optimizer = make_optimizer(1e-3)
    params = encoder.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, optimizer)
    step = make_contrastive_train_step(encoder, optimizer)

    rng = np.random.default_rng(0)
    size = encoder.config.vision.image_size
    batch = {
        "video": rng.normal(size=(8, 2, size, size, 3)).astype(np.float32),
        "text": rng.integers(1, 64, size=(8, 16)).astype(np.int32),
    }

    _, metrics_single = jax.jit(step)(state, jax.tree_util.tree_map(jnp.asarray, batch))

    state_tp = state.replace(params={**state.params,
                                     "encoder": shard_params(params, mesh_2d)})
    data_sharding = sharded_along(mesh_2d, axis="data")
    batch_tp = jax.tree_util.tree_map(lambda x: jax.device_put(x, data_sharding), batch)
    new_state, metrics_tp = jax.jit(step)(state_tp, batch_tp)

    assert float(metrics_tp["loss/train"]) == pytest.approx(
        float(metrics_single["loss/train"]), rel=1e-4)
    assert np.isfinite(float(metrics_tp["loss/train"]))
    # Updated params keep their tensor-parallel sharding.
    kernel = new_state.params["encoder"]["visual"]["transformer"]["blocks"]["mlp_fc"]["kernel"]
    assert "model" in str(kernel.sharding.spec)
