"""SpaceTimeTransformer (Frozen-in-Time's divided space-time ViT) in Flax.

Reference: aligner/encoder/video_transformer.py:81-340. Per block:
temporal attention (norm3 -> attn over frames at each spatial location) added
to the input, spatial attention (norm1 -> attn over patches within each frame)
ALSO added to the original input ("frozen-in-time" style), then MLP. The CLS
token attends over all tokens and its keys/values join every group. Positional
embedding = per-frame spatial embed tiled over time + temporal embed repeated
per frame. LN eps 1e-6, qkv bias, exact GELU.

The parameter tree mirrors torch module names (converter is a rename).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

PRECISION = jax.lax.Precision.HIGHEST


class LayerNormTorch(nn.Module):
    """LN with torch param names (weight/bias) for 1:1 checkpoint mapping."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        normed = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
            xf.var(-1, keepdims=True) + self.eps)
        return (normed * weight + bias).astype(x.dtype)


def _grouped_attention(q, k, v):
    logits = jnp.einsum("bid,bjd->bij", q, k, precision=PRECISION,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bij,bjd->bid", weights, v, precision=PRECISION)


class VarAttention(nn.Module):
    """Attention over a chosen axis (time or space) with global CLS
    (video_transformer.py:81-138)."""
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str, frames: int, patches: int):
        h = self.num_heads
        head_dim = self.dim // h
        qkv = nn.Dense(3 * self.dim, name="qkv", precision=PRECISION,
                       dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):  # (B, N, D) -> (B*h, N, d)
            b, n, _ = t.shape
            return t.reshape(b, n, h, head_dim).transpose(0, 2, 1, 3).reshape(b * h, n, head_dim)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = q * (head_dim ** -0.5)

        cls_q, q_ = q[:, :1], q[:, 1:]
        cls_k, k_ = k[:, :1], k[:, 1:]
        cls_v, v_ = v[:, :1], v[:, 1:]

        # CLS attends to everything.
        cls_out = _grouped_attention(cls_q, k, v)

        bh = q_.shape[0]
        if mode == "time":  # 'b (f n) d -> (b n) f d'
            def regroup(t):
                return t.reshape(bh, frames, patches, head_dim).transpose(0, 2, 1, 3) \
                        .reshape(bh * patches, frames, head_dim)

            def ungroup(t):
                return t.reshape(bh, patches, frames, head_dim).transpose(0, 2, 1, 3) \
                        .reshape(bh, frames * patches, head_dim)

            repeats = patches
        else:  # space: 'b (f n) d -> (b f) n d'
            def regroup(t):
                return t.reshape(bh * frames, patches, head_dim)

            def ungroup(t):
                return t.reshape(bh, frames * patches, head_dim)

            repeats = frames

        q_, k_, v_ = regroup(q_), regroup(k_), regroup(v_)
        cls_k_rep = jnp.repeat(cls_k, repeats, axis=0)
        cls_v_rep = jnp.repeat(cls_v, repeats, axis=0)
        out = _grouped_attention(q_, jnp.concatenate([cls_k_rep, k_], axis=1),
                                 jnp.concatenate([cls_v_rep, v_], axis=1))
        out = ungroup(out)
        out = jnp.concatenate([cls_out, out], axis=1)

        # (B*h, N, d) -> (B, N, D)
        b = out.shape[0] // h
        n = out.shape[1]
        out = out.reshape(b, h, n, head_dim).transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj", precision=PRECISION,
                        dtype=self.dtype)(out)


class SpaceTimeBlock(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frames: int, patches: int):
        time_out = VarAttention(self.dim, self.num_heads, dtype=self.dtype,
                                name="timeattn")(
            LayerNormTorch(name="norm3")(x), "time", frames, patches)
        time_residual = x + time_out
        space_out = VarAttention(self.dim, self.num_heads, dtype=self.dtype,
                                 name="attn")(
            LayerNormTorch(name="norm1")(time_residual), "space", frames, patches)
        space_residual = x + space_out  # frozen-in-time: residual from the input
        h = LayerNormTorch(name="norm2")(space_residual)
        h = nn.Dense(4 * self.dim, name="mlp_fc1", precision=PRECISION,
                     dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2", precision=PRECISION,
                     dtype=self.dtype)(h)
        return space_residual + h


class SpaceTimeTransformer(nn.Module):
    """Input: (B, F, H, W, 3) -> (B, embed_dim) CLS feature
    (video_transformer.py:181-340 with head/pre_logits = identity as the
    FrozenInTime wrapper sets them)."""
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    img_size: int = 224
    num_frames: int = 4
    # Compute dtype: fp32 (default) is the torch-oracle parity configuration;
    # bf16 is the production TPU eval configuration (fp32 HIGHEST matmuls are
    # ~6x emulated-pass cost on v5e). LayerNorms/softmax stay fp32 either way.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        video = video.astype(self.dtype)
        b, f = video.shape[0], video.shape[1]
        g, p = self.img_size // self.patch_size, self.patch_size
        patches_per_frame = g * g

        x = video.reshape(b * f, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5) \
                 .reshape(b * f, g * g, p * p * 3)
        x = nn.Dense(self.embed_dim, name="patch_embed", precision=PRECISION,
                     dtype=self.dtype)(x)
        x = x.reshape(b, f * patches_per_frame, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (self.embed_dim,))
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (patches_per_frame + 1, self.embed_dim))
        temporal_embed = self.param("temporal_embed", nn.initializers.zeros,
                                    (self.num_frames, self.embed_dim))

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype),
                              (b, 1, self.embed_dim)), x], axis=1)
        tile_pos = jnp.tile(pos_embed[1:], (self.num_frames, 1))
        tile_temporal = jnp.repeat(temporal_embed, patches_per_frame, axis=0)
        total = jnp.concatenate([pos_embed[:1], tile_pos + tile_temporal], axis=0)
        x = x + total[: x.shape[1]].astype(self.dtype)

        for i in range(self.depth):
            x = SpaceTimeBlock(self.embed_dim, self.num_heads, dtype=self.dtype,
                               name=f"blocks_{i}")(
                x, frames=f, patches=patches_per_frame)
        x = LayerNormTorch(name="norm")(x)
        return x[:, 0]
