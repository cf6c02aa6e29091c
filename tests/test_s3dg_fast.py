"""Parity of the restructured fast-eval S3DG forward (models/s3dg_fast.py)
against the Flax module: folded BN + merged branch convs + single gating
multiply must not change the math (reference semantics:
aligner/encoder/s3dg.py:11-218)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.models.s3dg import S3DG
from fitclip_tpu.models.s3dg_fast import s3dg_fast_apply


def _params_with_real_stats(model, rng_seed=0):
    params = model.init(jax.random.PRNGKey(rng_seed),
                        jnp.zeros((1, 16, 32, 32, 3)))["params"]
    rng = np.random.default_rng(rng_seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = getattr(path[-1], "key", "")
        if name == "running_mean":
            leaf = jnp.asarray((rng.normal(size=leaf.shape) * 0.1).astype(np.float32))
        elif name == "running_var":
            leaf = jnp.asarray((1.0 + rng.random(leaf.shape) * 0.5).astype(np.float32))
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-4), (jnp.bfloat16, 0.05)])
def test_fast_matches_flax(dtype, atol):
    model = S3DG(dtype=dtype)
    params = _params_with_real_stats(model)
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.random(size=(2, 16, 32, 32, 3)).astype(np.float32))

    ref = np.asarray(
        jax.jit(lambda p, v: model.apply({"params": p}, v))(params, video),
        np.float32)
    fast = np.asarray(
        jax.jit(lambda p, v: s3dg_fast_apply(p, v, dtype=dtype))(params, video),
        np.float32)
    # Identical contraction sets; only fusion boundaries and the fp32 BN
    # fold rounding differ.
    np.testing.assert_allclose(fast, ref, atol=atol * np.abs(ref).max(), rtol=0)
    cos = ((ref * fast).sum(-1) /
           (np.linalg.norm(ref, axis=-1) * np.linalg.norm(fast, axis=-1)))
    assert cos.min() > 0.999


def test_fast_path_wired_into_mil_nce_bf16():
    from fitclip_tpu.models.mil_nce import MilNceVideoTextEncoder

    fast_enc = MilNceVideoTextEncoder(dtype=jnp.bfloat16)
    assert fast_enc.fast  # bf16 eval defaults to the restructured forward
    slow_enc = MilNceVideoTextEncoder(dtype=jnp.bfloat16, fast=False)
    assert not slow_enc.fast
    assert not MilNceVideoTextEncoder(dtype=jnp.float32).fast

    params = fast_enc.init_params(jax.random.PRNGKey(0))
    video = jnp.asarray(
        np.random.default_rng(2).random((2, 16, 32, 32, 3)).astype(np.float32))
    a = np.asarray(fast_enc.encode_video(params, video), np.float32)
    b = np.asarray(slow_enc.encode_video(params, video), np.float32)
    cos = ((a * b).sum(-1) / (np.linalg.norm(a, axis=-1) *
                              np.linalg.norm(b, axis=-1)))
    assert cos.min() > 0.999


def test_fast_path_wired_into_videoclip_bf16():
    from fitclip_tpu.models.videoclip import VideoClipVideoTextEncoder

    fast_enc = VideoClipVideoTextEncoder(dtype=jnp.bfloat16, num_frames=32)
    slow_enc = VideoClipVideoTextEncoder(dtype=jnp.bfloat16, num_frames=32,
                                         fast=False)
    assert fast_enc.fast and not slow_enc.fast
    params = fast_enc.init_params(jax.random.PRNGKey(0))
    video = jnp.asarray(
        np.random.default_rng(3).random((1, 32, 32, 32, 3)).astype(np.float32))
    a = np.asarray(fast_enc.encode_video(params, video), np.float32)
    b = np.asarray(slow_enc.encode_video(params, video), np.float32)
    cos = ((a * b).sum(-1) / (np.linalg.norm(a, axis=-1) *
                              np.linalg.norm(b, axis=-1)))
    assert cos.min() > 0.999
