"""CLIP dual encoder (ViT vision tower + causal text transformer) in Flax.

A from-scratch TPU-first implementation with the same math as OpenAI CLIP
(the reference wraps the `clip` package, aligner/encoder/clip_video_text_encoder.py):

- Patch embedding as an unfold + matmul instead of a conv: XLA maps it straight
  onto the MXU with no layout shuffling.
- Transformer blocks are stacked with `nn.scan` (single compiled block body,
  layer-stacked parameters): faster compiles, and `remat` drops activation
  memory for training at ViT scale.
- Parameters live in fp32; activations run in a configurable compute dtype
  (bf16 on TPU). LayerNorms and softmax accumulate in fp32.
- The pixel normalization ((x/255 - mean) / std) can be folded into the patch
  embedding weights (`fold_pixel_normalization`) so the device-side input stays
  uint8 — 4x less HBM traffic on the eval hot path.

`logit_scale` is intentionally not a model parameter: the framework owns the
temperature in its train state, mirroring the reference deleting CLIP's own
scale (clip_video_text_encoder.py:76-77).
"""

import dataclasses
from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Explicit matmul precision: XLA's default lowers fp32 matmuls to bf16 passes
# (on TPU and, in this build, even on CPU), which breaks the <=1e-3 parity bar.
# For bf16 operands (the perf path) HIGHEST is a no-op, so this costs nothing.
PRECISION = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    vision: VisionConfig = VisionConfig()
    text: TextConfig = TextConfig()
    quick_gelu: bool = True

    @staticmethod
    def vit_b_32() -> "CLIPConfig":
        return CLIPConfig(vision=VisionConfig(patch_size=32))

    @staticmethod
    def vit_b_16() -> "CLIPConfig":
        return CLIPConfig()

    @staticmethod
    def vit_l_14(image_size: int = 224) -> "CLIPConfig":
        return CLIPConfig(
            embed_dim=768,
            vision=VisionConfig(image_size=image_size, patch_size=14, width=1024, layers=24, heads=16),
            text=TextConfig(width=768, heads=12, layers=12))

    @staticmethod
    def tiny_test(vocab_size: int = 64) -> "CLIPConfig":
        """Small config for unit tests: fast init/compile on CPU."""
        return CLIPConfig(
            embed_dim=32,
            vision=VisionConfig(image_size=32, patch_size=16, width=48, layers=2, heads=4),
            text=TextConfig(context_length=16, vocab_size=vocab_size, width=32, layers=2, heads=4))


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormFp32(nn.Module):
    """LayerNorm with fp32 statistics regardless of activation dtype.

    fp32 activations take the exact flax path (parity-tested vs torch at
    <=1e-4). bf16 activations take a hand-written variant that keeps the
    mean/var reductions and the normalize arithmetic in fp32 but never
    materializes an fp32 copy of the tensor — measured ~2x faster per LN on
    v5e (bench_bisect ln_fp32 vs ln_bf16) with identical fp32-stat math."""
    dtype: Dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype == jnp.float32:
            return nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                                param_dtype=jnp.float32, name="ln")(
                x.astype(jnp.float32))
        return _FastLayerNorm(self.eps, self.dtype, name="ln")(x)


class _FastLayerNorm(nn.Module):
    """bf16-activation LN: fp32 stats/arithmetic without an fp32 tensor copy.
    Param names match nn.LayerNorm (scale/bias) so the same converted weights
    load into either path."""
    eps: float
    out_dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        width = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (width,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (width,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        centered = x.astype(jnp.float32) - mean
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
        y = centered * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.out_dtype)


class QuantDense(nn.Module):
    """int8 W8A8 dense (ops/quant.py). Init yields zero weights — real
    parameters arrive via quantize_clip_params on a loaded fp32 tree.

    Two activation-quant modes: ``dynamic`` (per-row scales computed on the
    fly; accurate but pays a reduction pass per dense — calibration mode) and
    static (default; calibrated per-tensor ``act_scale`` param, quantize is a
    single fused elementwise op). Every call sows the observed activation
    abs-max so a calibration pass (mutable=["intermediates"]) can collect
    scales; when intermediates aren't mutable the sow is dropped and XLA DCEs
    the reduction."""
    features: int
    dtype: Dtype
    dynamic: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from fitclip_tpu.ops.quant import int8_dense, int8_dense_static

        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        act_scale = self.param("act_scale", nn.initializers.ones,
                               (1,), jnp.float32)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32))).reshape(1)
        self.sow("intermediates", "act_amax", amax)
        if self.dynamic:
            return int8_dense(x.astype(self.dtype), kernel_q, scale, bias)
        return int8_dense_static(x.astype(self.dtype), kernel_q, scale, bias,
                                 act_scale)


def _dense(quantized, features: int, dtype: Dtype, name: str):
    """quantized: False (float Dense), True ("static" int8) or "dynamic"."""
    if quantized:
        return QuantDense(features, dtype, dynamic=(quantized == "dynamic"),
                          name=name)
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                    precision=PRECISION, name=name)


class _FusedInProjAttention(nn.Module):
    """QKV projection (int8 W8A8, static act scale) + fused attention as ONE
    Pallas kernel (ops/attention.py:fused_int8_qkv_attention). Param names
    and shapes match QuantDense so quantize_clip_params / calibration trees
    load unchanged (this module is named "in_proj")."""
    width: int
    heads: int
    causal: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from fitclip_tpu.ops.attention import fused_int8_qkv_attention
        from fitclip_tpu.ops.quant import QUANT_EPS

        features = 3 * self.width
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (x.shape[-1], features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        act_scale = self.param("act_scale", nn.initializers.ones, (1,), jnp.float32)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32))).reshape(1)
        self.sow("intermediates", "act_amax", amax)
        inv = 127.0 / jnp.maximum(act_scale.astype(jnp.float32), QUANT_EPS)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                       -127, 127).astype(jnp.int8)
        out_scale = (act_scale.astype(jnp.float32) / 127.0) * scale
        head_dim = self.width // self.heads
        return fused_int8_qkv_attention(x_q, kernel_q, out_scale, bias,
                                        self.heads, head_dim ** -0.5,
                                        self.causal, out_dtype=self.dtype)


class MultiHeadAttention(nn.Module):
    """Self-attention with a fused QKV projection (matches OpenAI's in_proj
    layout so converted weights drop in as one matmul). With ``fused=True``
    the QK^T/softmax/AV core runs as a single Pallas kernel (logits stay in
    VMEM instead of round-tripping fp32 through HBM)."""
    width: int
    heads: int
    causal: bool
    dtype: Dtype
    fused: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seq = x.shape[-2]
        head_dim = self.width // self.heads
        if self.fused and self.quantized is True:
            # Static-int8 + fused: QKV projection AND attention in one kernel.
            out = _FusedInProjAttention(self.width, self.heads, self.causal,
                                        self.dtype, name="in_proj")(x)
            return _dense(self.quantized, self.width, self.dtype, "out_proj")(out)

        qkv = _dense(self.quantized, 3 * self.width, self.dtype, "in_proj")(x)

        if self.fused:
            # The kernel consumes the projection's UNSPLIT (B, L, 3*H*D)
            # output and does the q/k/v + head split/transpose on VMEM data.
            from fitclip_tpu.ops.attention import fused_attention_qkv

            out = fused_attention_qkv(qkv, self.heads, head_dim ** -0.5,
                                      self.causal)
            return _dense(self.quantized, self.width, self.dtype, "out_proj")(out)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.heads, head_dim)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        # fp32 logits + softmax for numeric stability under bf16 compute.
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                            preferred_element_type=jnp.float32, precision=PRECISION)
        logits = logits * (head_dim ** -0.5)
        if self.causal:
            mask = jnp.tril(jnp.ones((seq, seq), dtype=bool))
            logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", weights, v, precision=PRECISION)
        out = out.reshape(*out.shape[:-2], self.width)
        return _dense(self.quantized, self.width, self.dtype, "out_proj")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    causal: bool
    quick_gelu: bool
    dtype: Dtype
    fused_attention: bool = False
    ln_eps: float = 1e-5
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        x = x + MultiHeadAttention(self.width, self.heads, self.causal, self.dtype,
                                   self.fused_attention, self.quantized,
                                   name="attn")(
            LayerNormFp32(self.dtype, self.ln_eps, name="ln_1")(x))
        h = LayerNormFp32(self.dtype, self.ln_eps, name="ln_2")(x)
        h = _dense(self.quantized, 4 * self.width, self.dtype, "mlp_fc")(h)
        h = quick_gelu(h) if self.quick_gelu else nn.gelu(h, approximate=False)
        h = _dense(self.quantized, self.width, self.dtype, "mlp_proj")(h)
        return x + h, None


class Transformer(nn.Module):
    """Layer-scanned transformer: parameters carry a leading `layers` axis."""
    width: int
    layers: int
    heads: int
    causal: bool
    quick_gelu: bool
    dtype: Dtype
    remat: Union[bool, str] = False
    fused_attention: bool = False
    ln_eps: float = 1e-5
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        block_cls = ResidualBlock
        if self.remat:
            # remat=True: recompute everything (min memory). remat="dots":
            # save matmul outputs, recompute elementwise only — the stash
            # volume / recompute-FLOPs middle ground for training.
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if self.remat == "dots" else None)
            block_cls = nn.remat(block_cls, prevent_cse=False, policy=policy)
        scanned = nn.scan(
            block_cls,
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True},
            length=self.layers,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(self.width, self.heads, self.causal, self.quick_gelu, self.dtype,
          self.fused_attention, self.ln_eps, self.quantized, name="blocks")
        x, _ = scanned(x, None)
        return x


class VisionTransformer(nn.Module):
    config: VisionConfig
    embed_dim: int
    quick_gelu: bool
    dtype: Dtype
    remat: Union[bool, str] = False
    fused_attention: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in the model's expected (normalized) scale,
        or uint8 if normalization has been folded into the patch kernel."""
        cfg = self.config
        b = images.shape[0]
        g, p = cfg.grid_size, cfg.patch_size
        x = images.astype(self.dtype)
        # Unfold into patch vectors ordered (ph, pw, c) and project: one matmul
        # on the MXU, bit-equivalent to a stride-p conv.
        x = x.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
        x = nn.Dense(cfg.width, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                     precision=PRECISION, name="patch_embed")(x)

        class_embedding = self.param("class_embedding", nn.initializers.normal(0.02),
                                     (cfg.width,), jnp.float32)
        cls = jnp.broadcast_to(class_embedding.astype(self.dtype), (b, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.num_patches + 1, cfg.width), jnp.float32)
        x = x + pos.astype(self.dtype)

        x = LayerNormFp32(self.dtype, name="ln_pre")(x)
        x = Transformer(cfg.width, cfg.layers, cfg.heads, causal=False,
                        quick_gelu=self.quick_gelu, dtype=self.dtype, remat=self.remat,
                        fused_attention=self.fused_attention,
                        quantized=self.quantized, name="transformer")(x)
        x = LayerNormFp32(self.dtype, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, self.embed_dim), jnp.float32)
        return jnp.matmul(x, proj.astype(self.dtype), precision=PRECISION)


class TextTransformer(nn.Module):
    config: TextConfig
    embed_dim: int
    quick_gelu: bool
    dtype: Dtype
    remat: Union[bool, str] = False
    fused_attention: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids: (B, context_length) int32; the EOT token must carry the
        maximum id in each row (CLIP BPE convention) — pooling is argmax(ids)."""
        cfg = self.config
        embedding = self.param("token_embedding", nn.initializers.normal(0.02),
                               (cfg.vocab_size, cfg.width), jnp.float32)
        x = embedding[input_ids].astype(self.dtype)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width), jnp.float32)
        x = x + pos[: x.shape[1]].astype(self.dtype)
        x = Transformer(cfg.width, cfg.layers, cfg.heads, causal=True,
                        quick_gelu=self.quick_gelu, dtype=self.dtype, remat=self.remat,
                        fused_attention=self.fused_attention,
                        quantized=self.quantized, name="transformer")(x)
        x = LayerNormFp32(self.dtype, name="ln_final")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, self.embed_dim), jnp.float32)
        return jnp.matmul(x, proj.astype(self.dtype), precision=PRECISION)


class CLIPModel(nn.Module):
    config: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: Union[bool, str] = False
    fused_attention: bool = False
    quantized: bool = False

    def setup(self):
        self.visual = VisionTransformer(self.config.vision, self.config.embed_dim,
                                        self.config.quick_gelu, self.dtype, self.remat,
                                        self.fused_attention, self.quantized)
        self.text = TextTransformer(self.config.text, self.config.embed_dim,
                                    self.config.quick_gelu, self.dtype, self.remat,
                                    self.fused_attention, self.quantized)

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.visual(images)

    def encode_text(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text(input_ids)

    def __call__(self, images: jnp.ndarray, input_ids: jnp.ndarray):
        return self.encode_image(images), self.encode_text(input_ids)


def fold_pixel_normalization(params, mean, std, scale_255: bool = True):
    """Fold ((x / 255) - mean) / std into the patch-embedding kernel + bias.

    After folding, `encode_image` takes raw uint8 pixels (cast to the compute
    dtype) instead of normalized floats: W' = W * (1/(255*std_c)) per input
    channel, b' = b - sum_patch W . (mean/std). Equivalent because the patch
    embed is affine in the pixels.
    """
    import numpy as np

    params = jax.tree_util.tree_map(np.asarray, params)
    kernel = params["visual"]["patch_embed"]["kernel"]  # (p*p*3, width)
    bias = params["visual"]["patch_embed"]["bias"]
    mean = np.asarray(mean, dtype=kernel.dtype)
    std = np.asarray(std, dtype=kernel.dtype)
    ppc = kernel.shape[0] // 3  # patch pixels per channel group (ordered ph*pw, 3)
    # kernel rows are ordered (ph, pw, c): channel varies fastest.
    chan = np.tile(np.arange(3), ppc)
    denom = (255.0 if scale_255 else 1.0) * std
    new_kernel = kernel / denom[chan][:, None]
    shift = (mean / std)[chan][:, None]
    new_bias = bias - (kernel * shift).sum(axis=0)
    params["visual"]["patch_embed"]["kernel"] = new_kernel
    params["visual"]["patch_embed"]["bias"] = new_bias
    return params
