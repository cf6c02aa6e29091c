"""S3D-G (Gated Separable 3D ConvNet) in Flax — the MIL-NCE video tower.

Same architecture as the reference's vendored S3DG (aligner/encoder/s3dg.py:
142-218): space-to-depth stem, separable spatio-temporal convs, Inception
blocks with self-gating, TF-'SAME' max-pools with ceil semantics, global
mean-pool + FC. TPU-first choices: channels-last NDHWC layout (XLA's native
conv layout on TPU) and inference-mode BatchNorm folded into explicit
(scale, bias, mean, var) affine parameters.

The parameter tree intentionally mirrors the torch module names so the
checkpoint converter is a mechanical rename.
"""

from functools import partial
from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Size3 = Union[int, Tuple[int, int, int]]


def _triple(value: Size3) -> Tuple[int, int, int]:
    return (value, value, value) if isinstance(value, int) else tuple(value)


class BatchNorm3dInference(nn.Module):
    """Frozen-statistics BatchNorm (torch eval semantics, default eps 1e-5).

    The (inv, shift) affine is derived in fp32 from the fp32 running stats,
    then cast to the activation dtype so a bf16 tower stays bf16 end-to-end
    (fp32 affine operands would silently promote every activation tensor
    back to fp32 — doubling HBM traffic on the conv tower)."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


class STConv3D(nn.Module):
    """Conv3d(+BN+ReLU), optionally factored into spatial then temporal
    convolutions (s3dg.py:69-103)."""
    output_dim: int
    kernel_size: Size3
    stride: Size3 = 1
    padding: Size3 = 0
    separable: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        p = _triple(self.padding)

        def conv(x, kernel, stride, pad, name):
            return nn.Conv(self.output_dim, kernel_size=kernel, strides=stride,
                           padding=[(q, q) for q in pad], use_bias=False,
                           dtype=self.dtype, name=name)(x)

        if self.separable:
            spatial_k, temporal_k = (1, k[1], k[2]), (k[0], 1, 1)
            spatial_s, temporal_s = (1, s[1], s[2]), (s[0], 1, 1)
            spatial_p, temporal_p = (0, p[1], p[2]), (p[0], 0, 0)
            x = conv(x, spatial_k, spatial_s, spatial_p, "conv1")
            x = nn.relu(BatchNorm3dInference(self.output_dim, name="bn1")(x))
            x = conv(x, temporal_k, temporal_s, temporal_p, "conv2")
            x = nn.relu(BatchNorm3dInference(self.output_dim, name="bn2")(x))
        else:
            x = conv(x, k, s, p, "conv1")
            x = nn.relu(BatchNorm3dInference(self.output_dim, name="bn1")(x))
        return x


class SelfGating(nn.Module):
    """Squeeze-and-gate over spatio-temporal average (s3dg.py:48-61)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # fp32 accumulation: a bf16 sum over T*H*W (up to ~50k) elements
        # loses the mean to rounding long before the gate saturates.
        pooled = x.mean(axis=(1, 2, 3), dtype=jnp.float32).astype(x.dtype)
        weights = jax.nn.sigmoid(
            nn.Dense(self.features, dtype=self.dtype, name="fc")(pooled))
        return x * weights[:, None, None, None, :].astype(x.dtype)


def max_pool_3d_tf_padding(x: jnp.ndarray, kernel_size: Size3, stride: Size3) -> jnp.ndarray:
    """TF-'SAME' constant-pad followed by ceil-mode max pool
    (s3dg.py:105-138 semantics). x: (B, T, H, W, C)."""
    k = _triple(kernel_size)
    s = _triple(stride)
    pads = []
    for kd, sd in zip(k, s):
        total = max(kd - sd, 0)
        pads.append((total // 2, total - total // 2))
    # Extra high-side -inf padding emulates ceil_mode window placement.
    dims = x.shape[1:4]
    window_pads = []
    for (lo, hi), size, kd, sd in zip(pads, dims, k, s):
        padded = size + lo + hi
        out = -(-(padded - kd) // sd) + 1
        needed = (out - 1) * sd + kd
        window_pads.append((0, max(needed - padded, 0)))
    neg_inf = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    x = jnp.pad(x, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
    x = jnp.pad(x, ((0, 0), window_pads[0], window_pads[1], window_pads[2], (0, 0)),
                constant_values=neg_inf)
    return jax.lax.reduce_window(x, neg_inf, jax.lax.max,
                                 (1, *k, 1), (1, *s, 1), "VALID")


class InceptionBlock(nn.Module):
    """Four-branch Inception block with optional self-gating (s3dg.py:11-45)."""
    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3b: int
    gating: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.b0 + self.b1b + self.b2b + self.b3b

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = partial(STConv3D, dtype=self.dtype)
        branch0 = conv(self.b0, 1, name="conv_b0")(x)
        branch1 = conv(self.b1a, 1, name="conv_b1_a")(x)
        branch1 = conv(self.b1b, 3, padding=1, separable=True, name="conv_b1_b")(branch1)
        branch2 = conv(self.b2a, 1, name="conv_b2_a")(x)
        branch2 = conv(self.b2b, 3, padding=1, separable=True, name="conv_b2_b")(branch2)
        branch3 = max_pool_3d_tf_padding(x, 3, 1)
        branch3 = conv(self.b3b, 1, name="conv_b3_b")(branch3)
        if self.gating:
            branch0 = SelfGating(self.b0, dtype=self.dtype, name="gating_b0")(branch0)
            branch1 = SelfGating(self.b1b, dtype=self.dtype, name="gating_b1")(branch1)
            branch2 = SelfGating(self.b2b, dtype=self.dtype, name="gating_b2")(branch2)
            branch3 = SelfGating(self.b3b, dtype=self.dtype, name="gating_b3")(branch3)
        return jnp.concatenate([branch0, branch1, branch2, branch3], axis=-1)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T/2, H/2, W/2, 8C) with channel order
    (t2, h2, w2, c) matching the torch stem's weight layout (s3dg.py:183-189)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // 2, h // 2, w // 2, 8 * c)


class S3DG(nn.Module):
    """The full S3D-G backbone (s3dg.py:141-218). Input: (B, T, H, W, 3)."""
    embedding_size: int = 512
    use_space_to_depth: bool = True
    use_last_layer: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        conv = partial(STConv3D, dtype=self.dtype)
        block = partial(InceptionBlock, dtype=self.dtype)
        if self.use_space_to_depth:
            x = space_to_depth(x)
            x = conv(64, (2, 4, 4), stride=1, padding=(1, 2, 2), name="conv1")(x)
            x = x[:, 1:, 1:, 1:, :]
        else:
            x = conv(64, (3, 7, 7), stride=2, padding=(1, 3, 3), name="conv1")(x)
        x = max_pool_3d_tf_padding(x, (1, 3, 3), (1, 2, 2))
        x = conv(64, 1, name="conv_2b")(x)
        x = conv(192, 3, padding=1, separable=True, name="conv_2c")(x)
        x = SelfGating(192, dtype=self.dtype, name="gating")(x)
        x = max_pool_3d_tf_padding(x, (1, 3, 3), (1, 2, 2))
        x = block(64, 96, 128, 16, 32, 32, name="mixed_3b")(x)
        x = block(128, 128, 192, 32, 96, 64, name="mixed_3c")(x)
        x = max_pool_3d_tf_padding(x, 3, 2)
        x = block(192, 96, 208, 16, 48, 64, name="mixed_4b")(x)
        x = block(160, 112, 224, 24, 64, 64, name="mixed_4c")(x)
        x = block(128, 128, 256, 24, 64, 64, name="mixed_4d")(x)
        x = block(112, 144, 288, 32, 64, 64, name="mixed_4e")(x)
        x = block(256, 160, 320, 32, 128, 128, name="mixed_4f")(x)
        x = max_pool_3d_tf_padding(x, 2, 2)
        x = block(256, 160, 320, 32, 128, 128, name="mixed_5b")(x)
        x = block(384, 192, 384, 48, 128, 128, name="mixed_5c")(x)
        x = x.mean(axis=(1, 2, 3), dtype=jnp.float32).astype(self.dtype)
        if self.use_last_layer:
            x = nn.Dense(self.embedding_size, dtype=self.dtype, name="fc")(x)
        return x


class MilNceTextEncoder(nn.Module):
    """Word-embedding text tower (mil_nce_video_text_encoder.py:61-84):
    embed -> FC -> ReLU -> global max-pool over tokens -> FC."""
    output_size: int = 512
    vocab_size: int = 66250
    word_embedding_size: int = 300
    hidden_size: int = 2048

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        embedding = self.param("word_embd",
                               nn.initializers.normal(1.0),
                               (self.vocab_size, self.word_embedding_size))
        x = embedding[input_ids]
        x = nn.relu(nn.Dense(self.hidden_size, name="fc1")(x))
        x = x.max(axis=1)
        return nn.Dense(self.output_size, name="fc2")(x)
