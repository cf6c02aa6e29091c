"""Parity: the Pallas S3DG stem kernel (ops/s3dg_stem.py, interpret mode on
CPU) vs the XLA space-to-depth stem it replaces (models/s3dg_fast.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.models.s3dg import S3DG, max_pool_3d_tf_padding, space_to_depth
from fitclip_tpu.models.s3dg_fast import (_folded, _st_conv, _stem_kernel_path,
                                          s3dg_fast_apply)


def _random_stem_params(rng):
    return {
        "conv1": {
            "conv1": {"kernel": jnp.asarray(
                rng.normal(size=(2, 4, 4, 24, 64)).astype(np.float32) * 0.1)},
            "bn1": {
                "weight": jnp.asarray(1.0 + rng.random(64).astype(np.float32)),
                "bias": jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1),
                "running_mean": jnp.asarray(
                    rng.normal(size=64).astype(np.float32) * 0.1),
                "running_var": jnp.asarray(
                    1.0 + rng.random(64).astype(np.float32)),
            },
        }
    }


def _reference_stem(params, video, dtype):
    x = space_to_depth(video.astype(dtype))
    x = _st_conv(params["conv1"], x, (2, 4, 4), stride=1, padding=(1, 2, 2),
                 dtype=dtype)
    x = x[:, 1:, 1:, 1:, :]
    return max_pool_3d_tf_padding(x, (1, 3, 3), (1, 2, 2))


@pytest.mark.parametrize("shape", [(2, 4, 32, 32, 3), (1, 6, 16, 16, 3)])
def test_stem_kernel_matches_xla_stem(shape):
    rng = np.random.default_rng(0)
    params = _random_stem_params(rng)
    video = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    ref = np.asarray(_reference_stem(params, video, jnp.bfloat16), np.float32)
    got = np.asarray(
        _stem_kernel_path(params, video.astype(jnp.bfloat16), jnp.bfloat16),
        np.float32)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)
    denom = np.linalg.norm(ref.reshape(-1)) * np.linalg.norm(got.reshape(-1))
    cosine = float((ref * got).sum() / (denom + 1e-9))
    assert cosine > 0.9999, cosine


@pytest.mark.parametrize("shape", [(2, 6, 32, 32, 3), (1, 4, 16, 16, 3)])
def test_stem_kernel_v3_matches_v2(shape):
    """v3 (persistent two-slot slab, per-step single-row copy) computes the
    same conv+pool as v2 — including across clip boundaries and odd/even
    time-step parities, which is where slab reuse could go wrong."""
    from fitclip_tpu.ops.s3dg_stem import (pack_stem_weights_v2,
                                           pack_stem_weights_v3,
                                           s2d_transpose, s3dg_stem_conv_v2,
                                           s3dg_stem_conv_v3)

    rng = np.random.default_rng(3)
    params = _random_stem_params(rng)
    video = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    kern, bias = _folded(params["conv1"]["conv1"], params["conv1"]["bn1"],
                         jnp.bfloat16)
    xt = s2d_transpose(video.astype(jnp.bfloat16))
    ws = shape[3] // 2
    rpi = next(r for r in (4, 2, 1) if (shape[2] // 2) % r == 0)

    w2, b2, s2 = pack_stem_weights_v2(kern, bias, jnp.bfloat16,
                                      rows_per_iter=rpi)
    ref = np.asarray(s3dg_stem_conv_v2(xt, w2, b2, s2, ws=ws), np.float32)
    w3, b3, s3 = pack_stem_weights_v3(kern, bias, jnp.bfloat16,
                                      rows_per_iter=rpi)
    got = np.asarray(s3dg_stem_conv_v3(xt, w3, b3, s3, ws=ws), np.float32)

    assert got.shape == ref.shape
    # fp32 accumulation order differs (one 1024-deep dot vs two 512-deep
    # dots summed); bf16 outputs agree to rounding.
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-2 * scale, rtol=2e-2)
    denom = np.linalg.norm(ref.reshape(-1)) * np.linalg.norm(got.reshape(-1))
    assert float((ref * got).sum() / (denom + 1e-9)) > 0.9999


@pytest.mark.parametrize("shape", [(2, 6, 32, 32, 3), (1, 4, 16, 16, 3)])
def test_stem_kernel_v4_matches_v2(shape):
    """v4 (slab fed straight from the `s2d_rows` selection matmul, in-kernel
    (t2, h2) piece stores, in-kernel time padding) == v2."""
    from fitclip_tpu.ops.s3dg_stem import (pack_stem_weights_v2,
                                           pack_stem_weights_v4, s2d_rows,
                                           s2d_transpose, s3dg_stem_conv_v2,
                                           s3dg_stem_conv_v4)

    rng = np.random.default_rng(4)
    params = _random_stem_params(rng)
    video = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    kern, bias = _folded(params["conv1"]["conv1"], params["conv1"]["bn1"],
                         jnp.bfloat16)
    ws = shape[3] // 2
    rpi = next(r for r in (4, 2, 1) if (shape[2] // 2) % r == 0)

    w2, b2, s2 = pack_stem_weights_v2(kern, bias, jnp.bfloat16,
                                      rows_per_iter=rpi)
    ref = np.asarray(s3dg_stem_conv_v2(
        s2d_transpose(video.astype(jnp.bfloat16)), w2, b2, s2, ws=ws),
        np.float32)
    w4, b4, s4 = pack_stem_weights_v4(kern, bias, jnp.bfloat16,
                                      rows_per_iter=rpi)
    got = np.asarray(s3dg_stem_conv_v4(
        s2d_rows(video.astype(jnp.bfloat16)), w4, b4, s4, ws=ws), np.float32)

    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-2 * scale, rtol=2e-2)
    denom = np.linalg.norm(ref.reshape(-1)) * np.linalg.norm(got.reshape(-1))
    assert float((ref * got).sum() / (denom + 1e-9)) > 0.9999


def test_stem_kernel_shard_maps_over_data_mesh():
    """The stem kernel is a pallas_call, so multi-chip eval shard_maps it
    (cli/runners._shard_mapped via the encoders' uses_pallas property);
    sharded output must match the single-device run."""
    from fitclip_tpu.parallel import create_mesh, replicated, sharded_along
    from fitclip_tpu.parallel.mesh import shard_map_compat
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(2)
    params = _random_stem_params(rng)
    video = jnp.asarray(
        rng.normal(size=(8, 4, 16, 16, 3)).astype(np.float32))

    def step(p, v):
        return _stem_kernel_path(p, v.astype(jnp.bfloat16),
                                 jnp.bfloat16).astype(jnp.float32)

    single = np.asarray(step(params, video))

    mesh = create_mesh()
    sharded_step = jax.jit(shard_map_compat(
        step, mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data")))
    out = np.asarray(sharded_step(jax.device_put(params, replicated(mesh)),
                                  jax.device_put(video, sharded_along(mesh))))
    np.testing.assert_allclose(out, single, atol=1e-5, rtol=1e-5)


def test_full_forward_with_stem_kernel():
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.random((1, 4, 32, 32, 3)).astype(np.float32))
    model = S3DG(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 32, 32, 3)))["params"]

    base = np.asarray(
        s3dg_fast_apply(params, video, stem_kernel=False), np.float32)
    fused = np.asarray(
        s3dg_fast_apply(params, video, stem_kernel=True), np.float32)
    # Init-scale embeddings are ~1e-7, so compare against the tensor scale
    # (a cosine would be swamped by any epsilon in the denominator).
    scale = np.abs(base).max()
    np.testing.assert_allclose(fused, base, atol=2e-2 * scale, rtol=2e-2)
