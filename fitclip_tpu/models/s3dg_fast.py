"""Fast-eval S3DG forward: same parameter tree as `models/s3dg.py`'s Flax
module, restructured for the TPU memory system.

The device trace (scripts/profile_s3dg.py) shows the Flax forward spends
its non-stem time in many narrow ops: every Inception block launches three
independent 1x1x1 convs over the SAME input (output widths as small as 16
— 12% MXU column occupancy), a BatchNorm affine pass per conv, and four
per-branch gating multiplies. This forward:

  * folds the frozen BatchNorm affines into the conv kernels (fp32 fold,
    then cast: conv + bias + ReLU is one op, no separate affine pass);
  * merges each block's three parallel 1x1x1 branch convs into ONE conv
    whose output width is the branches' sum — one read of the input
    activation instead of three, and a full-width matmul for the MXU;
  * applies self-gating as a single broadcast multiply on the
    concatenated block output (gate vectors are computed from the
    per-branch means, concatenated once) instead of four separate
    multiply passes.

Numerics match the Flax module to bf16 tolerance (tests/test_s3dg_fast.py)
— the contraction sets are identical; only fusion boundaries move.

Reference semantics: aligner/encoder/s3dg.py:11-218 (vendored S3D-G).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from fitclip_tpu.models.s3dg import (Size3, _triple, max_pool_3d_tf_padding,
                                     space_to_depth)


def _bn_affine(bn, eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(inv, shift) of the frozen-stats BatchNorm, computed in fp32."""
    var = bn["running_var"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps) * bn["weight"].astype(jnp.float32)
    shift = bn["bias"].astype(jnp.float32) - bn["running_mean"].astype(jnp.float32) * inv
    return inv, shift


def _folded(conv_params, bn_params, dtype):
    """BN folded into the conv: kernel' = kernel * inv[c_out], bias = shift."""
    inv, shift = _bn_affine(bn_params)
    kernel = conv_params["kernel"].astype(jnp.float32) * inv
    return kernel.astype(dtype), shift.astype(dtype)


def _conv3d(x, kernel, stride: Size3 = 1, padding: Size3 = 0):
    s, p = _triple(stride), _triple(padding)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=s, padding=[(q, q) for q in p],
        dimension_numbers=dn)


def _st_conv(params, x, kernel_size: Size3, stride: Size3 = 1,
             padding: Size3 = 0, separable: bool = False, dtype=jnp.bfloat16):
    """STConv3D with the BN affines folded into the kernels."""
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    if separable:
        kern, bias = _folded(params["conv1"], params["bn1"], dtype)
        x = jax.nn.relu(_conv3d(x, kern, (1, s[1], s[2]), (0, p[1], p[2])) + bias)
        kern, bias = _folded(params["conv2"], params["bn2"], dtype)
        return jax.nn.relu(_conv3d(x, kern, (s[0], 1, 1), (p[0], 0, 0)) + bias)
    kern, bias = _folded(params["conv1"], params["bn1"], dtype)
    return jax.nn.relu(_conv3d(x, kern, s, p) + bias)


def _gate(params, pooled):
    """sigmoid(fc(pooled)) for one branch; pooled is fp32, gate in fp32."""
    return jax.nn.sigmoid(
        pooled @ params["fc"]["kernel"].astype(jnp.float32)
        + params["fc"]["bias"].astype(jnp.float32))


def _inception_block(params, x, widths, dtype, defer_gate=False):
    b0, b1a, b1b, b2a, b2b, b3b = widths
    # One merged 1x1x1 conv for the three parallel branch stems.
    kernels, biases = zip(*(
        _folded(params[name]["conv1"], params[name]["bn1"], dtype)
        for name in ("conv_b0", "conv_b1_a", "conv_b2_a")))
    merged = jax.nn.relu(
        _conv3d(x, jnp.concatenate(kernels, axis=-1))
        + jnp.concatenate(biases))
    branch0 = merged[..., :b0]
    branch1 = _st_conv(params["conv_b1_b"], merged[..., b0:b0 + b1a],
                       3, padding=1, separable=True, dtype=dtype)
    branch2 = _st_conv(params["conv_b2_b"], merged[..., b0 + b1a:],
                       3, padding=1, separable=True, dtype=dtype)
    branch3 = _st_conv(params["conv_b3_b"], max_pool_3d_tf_padding(x, 3, 1),
                       1, dtype=dtype)
    parts = [branch0, branch1, branch2, branch3]
    out = jnp.concatenate(parts, axis=-1)
    if "gating_b0" not in params:
        return (out, None) if defer_gate else out
    # Gate vectors from the per-branch means (fp32 accumulation, same as
    # SelfGating), applied as ONE multiply on the concatenated output
    # instead of four per-branch passes.
    gates = jnp.concatenate([
        _gate(params[f"gating_b{i}"], part.mean(axis=(1, 2, 3),
                                                dtype=jnp.float32))
        for i, part in enumerate(parts)], axis=-1).astype(dtype)
    if defer_gate:
        # The caller max-pools next: sigmoid gates are positive per-channel
        # scales, and max commutes with positive scaling, so the multiply
        # moves AFTER the pool onto the 4-8x smaller tensor (the gate MEANS
        # still come from the pre-pool activation, exactly as the module).
        return out, gates
    return out * gates[:, None, None, None, :]


def _gated(pair):
    out, gates = pair
    return out if gates is None else out * gates[:, None, None, None, :]


_BLOCK_WIDTHS = {
    "mixed_3b": (64, 96, 128, 16, 32, 32),
    "mixed_3c": (128, 128, 192, 32, 96, 64),
    "mixed_4b": (192, 96, 208, 16, 48, 64),
    "mixed_4c": (160, 112, 224, 24, 64, 64),
    "mixed_4d": (128, 128, 256, 24, 64, 64),
    "mixed_4e": (112, 144, 288, 32, 64, 64),
    "mixed_4f": (256, 160, 320, 32, 128, 128),
    "mixed_5b": (256, 160, 320, 32, 128, 128),
    "mixed_5c": (384, 192, 384, 48, 128, 128),
}


def _stem_kernel_path(params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """space_to_depth + conv1 + BN + ReLU + the first max pool, all inside
    the Pallas stem kernel (ops/s3dg_stem.py). Returns NDHWC at 1/4 res."""
    import os

    from fitclip_tpu.ops import s3dg_stem as _stem

    kern, bias = _folded(params["conv1"]["conv1"], params["conv1"]["bn1"], dtype)
    # rows_per_iter=4 measured best on v5e (3.90 ms vs 4.07 at r2 / 5.14 at
    # r1, scripts/bench_s3dg_stem3.py); fall back to a divisor of Hs for
    # non-multiple-of-8 input heights. v3 (persistent two-slot slab: the
    # time tap written at step t-1 is reused in place, so each step
    # lane-rolls and fetches only the NEW row) measured 3.99 -> 2.91 ms at
    # rows_per_iter=4 (scripts/bench_s3dg_stem3.py, v5e); v4 feeds the slab
    # straight from the selection matmul (`s2d_rows`), dropping the XLA
    # pad/transpose relayouts. S3DG_STEM_V picks the generation.
    version = os.environ.get("S3DG_STEM_V", "3")
    pack, conv, producer = {
        "2": (_stem.pack_stem_weights_v2, _stem.s3dg_stem_conv_v2,
              _stem.s2d_transpose),
        "3": (_stem.pack_stem_weights_v3, _stem.s3dg_stem_conv_v3,
              _stem.s2d_transpose),
        "4": (_stem.pack_stem_weights_v4, _stem.s3dg_stem_conv_v4,
              _stem.s2d_rows),
    }[version]
    rpi = next(r for r in (4, 2, 1) if (x.shape[2] // 2) % r == 0)
    w2, bias_b, sel = pack(kern, bias, dtype, rows_per_iter=rpi)
    y = conv(producer(x), w2, bias_b, sel, ws=x.shape[3] // 2)
    return y.transpose(0, 1, 2, 4, 3)  # (B, Ts, Hp, Wp, 64) NDHWC


def s3dg_fast_apply(params, video: jnp.ndarray, dtype=jnp.bfloat16,
                    use_space_to_depth: bool = True,
                    use_last_layer: bool = True,
                    stem_kernel: bool = None) -> jnp.ndarray:
    """Drop-in for `S3DG(...).apply({"params": params}, video)` at eval.

    video: (B, T, H, W, 3) raw pixels; returns (B, 512) embeddings.
    stem_kernel=None routes the s2d stem through the Pallas conv kernel on
    TPU (ops/s3dg_stem.py); True forces it (interpret mode off-TPU).
    """
    if stem_kernel is None:
        stem_kernel = use_space_to_depth and jax.default_backend() == "tpu"
    x = video.astype(dtype)
    conv = partial(_st_conv, dtype=dtype)
    if stem_kernel and use_space_to_depth:
        x = _stem_kernel_path(params, x, dtype)
    else:
        if use_space_to_depth:
            x = space_to_depth(x)
            x = conv(params["conv1"], x, (2, 4, 4), stride=1, padding=(1, 2, 2))
            x = x[:, 1:, 1:, 1:, :]
        else:
            x = conv(params["conv1"], x, (3, 7, 7), stride=2, padding=(1, 3, 3))
        x = max_pool_3d_tf_padding(x, (1, 3, 3), (1, 2, 2))
    x = conv(params["conv_2b"], x, 1)
    x = conv(params["conv_2c"], x, 3, padding=1, separable=True)
    # Self-gating deferred past the pool (see _inception_block defer_gate):
    # the gate mean reads the 56^2 activation, the multiply runs at 28^2.
    # (Splitting the mean out of the temporal conv's epilogue with an
    # optimization_barrier measured NEGATIVE — 1675 -> 1531 clips/s: the
    # 1.56 ms fused epilogue already hides the reduce behind the conv; a
    # separate reduce pays a second full read of the 154 MB activation.)
    gate = _gate(params["gating"],
                 x.mean(axis=(1, 2, 3), dtype=jnp.float32)).astype(dtype)
    x = max_pool_3d_tf_padding(x, (1, 3, 3), (1, 2, 2))
    x = x * gate[:, None, None, None, :]
    x = _inception_block(params["mixed_3b"], x, _BLOCK_WIDTHS["mixed_3b"], dtype)
    x, gate = _inception_block(params["mixed_3c"], x,
                               _BLOCK_WIDTHS["mixed_3c"], dtype,
                               defer_gate=True)
    x = _gated((max_pool_3d_tf_padding(x, 3, 2), gate))
    for name in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e"):
        x = _inception_block(params[name], x, _BLOCK_WIDTHS[name], dtype)
    x, gate = _inception_block(params["mixed_4f"], x,
                               _BLOCK_WIDTHS["mixed_4f"], dtype,
                               defer_gate=True)
    x = _gated((max_pool_3d_tf_padding(x, 2, 2), gate))
    x = _inception_block(params["mixed_5b"], x, _BLOCK_WIDTHS["mixed_5b"], dtype)
    # The global mean is linear, so mixed_5c's gate commutes through it and
    # multiplies a (B, C) vector instead of the (B, T, H, W, C) tensor.
    x, gate = _inception_block(params["mixed_5c"], x,
                               _BLOCK_WIDTHS["mixed_5c"], dtype,
                               defer_gate=True)
    x = x.mean(axis=(1, 2, 3), dtype=jnp.float32).astype(dtype)
    if gate is not None:
        x = x * gate
    if use_last_layer:
        x = x @ params["fc"]["kernel"].astype(dtype) + params["fc"]["bias"].astype(dtype)
    return x
