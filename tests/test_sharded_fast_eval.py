"""Multi-device eval with the Pallas megakernel path.

GSPMD cannot partition a pallas_call: under plain jit a data-sharded batch
gets ALL-GATHERED and the full kernel runs on every device (verified in HLO).
The runners therefore shard_map fused_block encode steps over the data axis
(cli/runners._shard_mapped). These tests pin both halves: the shard_mapped
step keeps the batch sharded (no full-batch all-gather in the compiled HLO)
and matches single-device numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.models.clip import CLIPConfig
from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
from fitclip_tpu.parallel import create_mesh, replicated, sharded_along


@pytest.fixture(scope="module")
def fused_encoder():
    encoder = ClipVideoTextEncoder(CLIPConfig.tiny_test(), num_frames=2,
                                   quantized=True, fused_attention=True)
    assert encoder.fused_block
    params = encoder.init_params(jax.random.PRNGKey(0))
    return encoder, params


def test_shard_mapped_step_partitions_and_matches(fused_encoder):
    from fitclip_tpu.cli.runners import _shard_mapped

    encoder, params = fused_encoder
    mesh = create_mesh()
    assert mesh.devices.size == 8

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(16, 2, 32, 32, 3)).astype(np.float32))
    text = jnp.asarray(rng.integers(1, 60, size=(16, 16)).astype(np.int32))

    def step(params, video, text):
        return (encoder.encode_video(params, video).astype(jnp.float32),
                encoder.encode_text(params, text).astype(jnp.float32))

    sharded_step = jax.jit(_shard_mapped(step, encoder, mesh, 2))
    p_rep = jax.device_put(params, replicated(mesh))
    v_sh = jax.device_put(video, sharded_along(mesh))
    t_sh = jax.device_put(text, sharded_along(mesh))

    # (a) No full-batch all-gather of the activations: inside shard_map the
    # kernel sees only the local shard, so no f32[16|32,...] gathers appear.
    hlo = sharded_step.lower(p_rep, v_sh, t_sh).compile().as_text()
    gathered_full = [line for line in hlo.splitlines()
                     if "all-gather" in line and "f32[32," in line]
    assert not gathered_full, gathered_full[:2]

    v_out, t_out = sharded_step(p_rep, v_sh, t_sh)
    v_ref, t_ref = step(params, video, text)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(t_out), np.asarray(t_ref),
                               atol=2e-5, rtol=2e-5)


def test_plain_jit_would_gather(fused_encoder):
    """Documents WHY the shard_map wrapper exists: without it, GSPMD gathers
    the sharded batch to run the unpartitionable pallas call."""
    encoder, params = fused_encoder
    mesh = create_mesh()
    rng = np.random.default_rng(1)
    video = jax.device_put(
        jnp.asarray(rng.normal(size=(16, 2, 32, 32, 3)).astype(np.float32)),
        sharded_along(mesh))
    p_rep = jax.device_put(params, replicated(mesh))
    f = jax.jit(lambda p, v: encoder.encode_video(p, v))
    hlo = f.lower(p_rep, video).compile().as_text()
    assert "all-gather" in hlo


def test_shard_mapped_slip_int8_matches():
    """The SLIP int8 megakernel path (models/slip_fast.py) rides the same
    generic _shard_mapped dispatch (duck-typed on encoder.fused_block):
    sharded == single-device numerics on the 8-device mesh."""
    from fitclip_tpu.cli.runners import _shard_mapped
    from fitclip_tpu.models.slip import SlipConfig, SlipVideoTextEncoder

    encoder = SlipVideoTextEncoder(SlipConfig.tiny_test(), num_frames=2,
                                   quantized=True, fused_attention=True)
    assert encoder.fused_block
    params = encoder.init_params(jax.random.PRNGKey(0))
    mesh = create_mesh()

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(16, 2, 32, 32, 3)).astype(np.float32))
    text = jnp.asarray(rng.integers(1, 60, size=(16, 16)).astype(np.int32))

    def step(params, video, text):
        return (encoder.encode_video(params, video).astype(jnp.float32),
                encoder.encode_text(params, text).astype(jnp.float32))

    sharded_step = jax.jit(_shard_mapped(step, encoder, mesh, 2))
    v_out, t_out = sharded_step(jax.device_put(params, replicated(mesh)),
                                jax.device_put(video, sharded_along(mesh)),
                                jax.device_put(text, sharded_along(mesh)))
    v_ref, t_ref = step(params, video, text)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(t_out), np.asarray(t_ref),
                               atol=2e-5, rtol=2e-5)


def test_shard_mapped_fit_int8_matches():
    """The Frozen-in-Time whole-block megakernel path (fit_fast.py) rides
    the same _shard_mapped dispatch: sharded == single-device numerics."""
    from fitclip_tpu.cli.runners import _shard_mapped
    from fitclip_tpu.models.frozen_in_time.encoder import (
        FrozenInTimeConfig, FrozenInTimeVideoTextEncoder)

    cfg = FrozenInTimeConfig.tiny_test()
    encoder = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                           max_tokens=16, dtype="int8",
                                           fused_attention=False,
                                           fused_block=True)
    assert encoder.fused_block
    params = encoder.init_params(jax.random.PRNGKey(0))
    mesh = create_mesh()

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(16, cfg.num_frames, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    text = jnp.asarray(rng.integers(1, 90, size=(16, 12)).astype(np.int32))
    params = encoder.calibrate(params, video[:4])

    def step(params, video, text):
        return (encoder.encode_video(params, video).astype(jnp.float32),
                encoder.encode_text(params, text).astype(jnp.float32))

    sharded_step = jax.jit(_shard_mapped(step, encoder, mesh, 2))
    v_out, t_out = sharded_step(jax.device_put(params, replicated(mesh)),
                                jax.device_put(video, sharded_along(mesh)),
                                jax.device_put(text, sharded_along(mesh)))
    v_ref, t_ref = step(params, video, text)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v_ref),
                               atol=2e-5, rtol=2e-5)
    # The DistilBERT text tower is plain XLA bf16 (not a Pallas kernel):
    # per-shard batch sizes change the GEMM tiling, so accumulation order
    # differs at bf16 rounding level — compare at bf16 tolerance.
    np.testing.assert_allclose(np.asarray(t_out), np.asarray(t_ref),
                               atol=2e-2, rtol=2e-2)


def test_shard_mapped_engages_for_flax_fused_attention():
    """bf16 + flax fused attention (no megakernel) ALSO runs Pallas — the
    runners must shard_map it too (encoder.fused_attention duck-typing)."""
    from fitclip_tpu.cli.runners import _shard_mapped

    encoder = ClipVideoTextEncoder(CLIPConfig.tiny_test(), num_frames=2,
                                   fused_attention=True)
    assert not encoder.fused_block and encoder.fused_attention
    params = encoder.init_params(jax.random.PRNGKey(0))
    mesh = create_mesh()

    rng = np.random.default_rng(2)
    video = jnp.asarray(rng.normal(size=(16, 2, 32, 32, 3)).astype(np.float32))

    def step(params, video):
        return encoder.encode_video(params, video).astype(jnp.float32)

    sharded_step = jax.jit(_shard_mapped(step, encoder, mesh, 1))
    assert sharded_step is not jax.jit(step)  # the wrapper engaged
    v_sh = jax.device_put(video, sharded_along(mesh))
    p_rep = jax.device_put(params, replicated(mesh))
    hlo = sharded_step.lower(p_rep, v_sh).compile().as_text()
    gathered_full = [line for line in hlo.splitlines()
                     if "all-gather" in line and "f32[16," in line]
    assert not gathered_full, gathered_full[:2]
    np.testing.assert_allclose(np.asarray(sharded_step(p_rep, v_sh)),
                               np.asarray(step(params, video)),
                               atol=2e-5, rtol=2e-5)
