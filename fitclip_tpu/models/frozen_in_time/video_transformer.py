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

from typing import Any, Optional

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
        # Two-pass form reusing `centered` (same biased variance as
        # torch/jnp.var, which recomputes the mean internally — profiled at
        # an extra full-tensor pass per LN on this 785-token layout).
        mean = xf.mean(-1, keepdims=True)
        centered = xf - mean
        var = (centered * centered).mean(-1, keepdims=True)
        normed = centered * jax.lax.rsqrt(var + self.eps)
        return (normed * weight + bias).astype(x.dtype)


def _cls_global_attention(qkv, heads: int, dim: int):
    """The CLS token's attention over the FULL sequence: one query row,
    sliced before any head reshape so no full-tensor pass is spent on it.
    Returns (B, 1, dim) in the compute dtype."""
    b, n, _ = qkv.shape
    d = dim // heads
    cls_q = qkv[:, 0, :dim].reshape(b, heads, d) * (d ** -0.5)
    k = qkv[:, :, dim:2 * dim].reshape(b, n, heads, d)
    v = qkv[:, :, 2 * dim:].reshape(b, n, heads, d)
    logits = jnp.einsum("bhd,bnhd->bhn", cls_q, k, precision=PRECISION,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhn,bnhd->bhd", weights, v, precision=PRECISION,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, 1, dim).astype(qkv.dtype)


def _cls_global_attention_split(qkv_cls, qkv_patch, heads: int, dim: int):
    """_cls_global_attention over a split projection (CLS row and patch rows
    projected separately): softmax over [cls | patches], same key order as
    the combined sequence. Returns (B, 1, dim)."""
    b = qkv_cls.shape[0]
    d = dim // heads
    cls_q = qkv_cls[:, 0, :dim].reshape(b, heads, d) * (d ** -0.5)
    cls_k = qkv_cls[:, 0, dim:2 * dim].reshape(b, heads, d)
    cls_v = qkv_cls[:, 0, 2 * dim:].reshape(b, heads, d)
    k = qkv_patch[:, :, dim:2 * dim].reshape(b, -1, heads, d)
    v = qkv_patch[:, :, 2 * dim:].reshape(b, -1, heads, d)
    l_cls = jnp.einsum("bhd,bhd->bh", cls_q, cls_k, precision=PRECISION,
                       preferred_element_type=jnp.float32)[..., None]
    l_pat = jnp.einsum("bhd,bnhd->bhn", cls_q, k, precision=PRECISION,
                       preferred_element_type=jnp.float32)
    w = jax.nn.softmax(jnp.concatenate([l_cls, l_pat], axis=-1),
                       axis=-1).astype(v.dtype)
    out = jnp.einsum("bh,bhd->bhd", w[..., 0], cls_v, precision=PRECISION,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bhn,bnhd->bhd", w[..., 1:], v, precision=PRECISION,
                           preferred_element_type=jnp.float32)
    return out.reshape(b, 1, dim).astype(qkv_cls.dtype)


class VarAttention(nn.Module):
    """Attention over a chosen axis (time or space) with global CLS
    (video_transformer.py:81-138).

    Layout-free formulation (profiled: the previous head-fold/regroup/
    ungroup transposes plus the CLS repeat+concat of K/V cost ~64 ms of
    pure copies/reshapes/slices per 32-clip eval call — a third of the
    forward). Heads and groups ride dot_general BATCH dims via einsum, so
    the only data movement is pure reshapes; the CLS key/value joins each
    group in LOGIT space (one lane-axis concat of the scores) instead of
    materializing repeated K/V tensors. Same math: softmax over
    [cls | group] in fp32, weights cast to the compute dtype, per-head
    outputs accumulated in fp32."""
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # fused=True runs the SPACE attention through the Pallas fused-attention
    # kernel (ops/attention.py) with the CLS row folded into each frame group
    # — (B*F, 1+P, 3D) is exactly the CLIP ViT eval shape the kernel is
    # gated on, and the (P, 1+P) fp32 logits stay in VMEM instead of ~240 MB
    # of HBM softmax traffic per eval call. Inference-oriented (FiT is
    # eval-only here); einsum remains the oracle-parity default.
    fused: bool = False
    # quantized: False (float denses), True (int8 W8A8 with calibrated static
    # activation scales) or "dynamic" (per-row scales — calibration mode).
    # Only the qkv/proj/mlp denses quantize; LN/softmax/attention stay
    # bf16/fp32 (same scheme as the CLIP/SLIP towers, ops/quant.py).
    quantized: Any = False

    @nn.compact
    def __call__(self, x, mode: str, frames: int, patches: int):
        from fitclip_tpu.models.clip.model import _dense

        h = self.num_heads
        d = self.dim // h
        b, n, _ = x.shape
        qkv_dense = _dense(self.quantized, 3 * self.dim, self.dtype,
                           name="qkv")

        if self.fused:
            from fitclip_tpu.ops.attention import fused_attention_qkv_gkv

            # The qkv projection runs SEPARATELY on the CLS row and the
            # patch rows (same module → shared params): slicing the patch
            # block out of a combined (B, N, 3W) projection afterwards
            # costs a full relayout pass of the 3x-wide tensor (profiled
            # ~6 ms/call), while x[:, 1:] slices the 1x-wide input once
            # and the group reshape below becomes a pure view.
            qkv_cls = qkv_dense(x[:, :1])         # (B, 1, 3D)
            qkv_patch = qkv_dense(x[:, 1:])       # (B, F·P, 3D)
            D = self.dim
            if mode == "space":
                # Per-frame groups + the clip's CLS qkv as the kernel's
                # GLOBAL key/value row (the reference's concat semantics,
                # without materializing a (groups, 1+P, 3W) concat in HBM
                # or slicing the CLS row back off the output).
                groups = qkv_patch.reshape(b * frames, patches, 3 * D)
                gkv = jnp.broadcast_to(qkv_cls, (b, frames, 3 * D)) \
                         .reshape(b * frames, 3 * D)
                out = fused_attention_qkv_gkv(groups, gkv, h, d ** -0.5)
                out = out.reshape(b, frames * patches, D)
            else:
                # Natural-layout time kernel: no time-major relayout at all
                # — per-(frame, frame) logits are VPU lane-reductions over
                # row slices inside VMEM (measured 0.93 vs 1.40 ms/layer
                # for the transpose + grouped-kernel formulation it
                # replaced, transposes included).
                from fitclip_tpu.ops.attention import fused_time_attention

                out = fused_time_attention(qkv_patch, qkv_cls[:, 0], h,
                                           frames, d ** -0.5)
            cls_out = _cls_global_attention_split(qkv_cls, qkv_patch, h, D)
            out = jnp.concatenate([cls_out, out], axis=1).astype(x.dtype)
            return _dense(self.quantized, self.dim, self.dtype,
                          name="proj")(out)

        qkv = qkv_dense(x)

        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, d) * (d ** -0.5)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)

        cls_out = _cls_global_attention(qkv, h, self.dim)

        # Patch tokens grouped (B, F, P, H, d) — reshapes only.
        q_ = q[:, 1:].reshape(b, frames, patches, h, d)
        k_ = k[:, 1:].reshape(b, frames, patches, h, d)
        v_ = v[:, 1:].reshape(b, frames, patches, h, d)
        cls_k, cls_v = k[:, 0], v[:, 0]

        if mode == "time":  # attend over frames at each spatial location
            # ONE explicit relayout to time-major (B, P, H, F, d) per
            # operand; every contraction below is then a native batched
            # matmul with its batch dims leading (exotic einsum output
            # orders here measured as several hidden XLA transposes of the
            # full 38 MB tensors per block).
            tq = q_.transpose(0, 2, 3, 1, 4)
            tk = k_.transpose(0, 2, 3, 1, 4)
            tv = v_.transpose(0, 2, 3, 1, 4)
            logits = jnp.einsum("bphfd,bphgd->bphfg", tq, tk,
                                precision=PRECISION,
                                preferred_element_type=jnp.float32)
            cls_l = jnp.einsum("bphfd,bhd->bphf", tq, cls_k,
                               precision=PRECISION,
                               preferred_element_type=jnp.float32)
            w = jax.nn.softmax(
                jnp.concatenate([cls_l[..., None], logits], axis=-1),
                axis=-1).astype(v.dtype)
            out = jnp.einsum("bphfg,bphgd->bphfd", w[..., 1:], tv,
                             precision=PRECISION,
                             preferred_element_type=jnp.float32)
            out = out + jnp.einsum("bphf,bhd->bphfd", w[..., 0], cls_v,
                                   precision=PRECISION,
                                   preferred_element_type=jnp.float32)
            out = out.transpose(0, 3, 1, 2, 4)  # back to (B, F, P, H, d)
        else:  # space: attend over patches within each frame
            logits = jnp.einsum("bfphd,bfqhd->bfhpq", q_, k_,
                                precision=PRECISION,
                                preferred_element_type=jnp.float32)
            cls_l = jnp.einsum("bfphd,bhd->bfhp", q_, cls_k,
                               precision=PRECISION,
                               preferred_element_type=jnp.float32)
            w = jax.nn.softmax(
                jnp.concatenate([cls_l[..., None], logits], axis=-1),
                axis=-1).astype(v.dtype)
            out = jnp.einsum("bfhpq,bfqhd->bfphd", w[..., 1:], v_,
                             precision=PRECISION,
                             preferred_element_type=jnp.float32)
            out = out + jnp.einsum("bfhp,bhd->bfphd", w[..., 0], cls_v,
                                   precision=PRECISION,
                                   preferred_element_type=jnp.float32)

        out = jnp.concatenate(
            [cls_out, out.reshape(b, frames * patches, self.dim)],
            axis=1).astype(x.dtype)
        return _dense(self.quantized, self.dim, self.dtype, name="proj")(out)


class SpaceTimeBlock(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    fused_attention: bool = False
    quantized: Any = False

    @nn.compact
    def __call__(self, x, frames: int, patches: int):
        from fitclip_tpu.models.clip.model import _dense

        time_out = VarAttention(self.dim, self.num_heads, dtype=self.dtype,
                                fused=self.fused_attention,
                                quantized=self.quantized, name="timeattn")(
            LayerNormTorch(name="norm3")(x), "time", frames, patches)
        time_residual = x + time_out
        space_out = VarAttention(self.dim, self.num_heads, dtype=self.dtype,
                                 fused=self.fused_attention,
                                 quantized=self.quantized, name="attn")(
            LayerNormTorch(name="norm1")(time_residual), "space", frames, patches)
        space_residual = x + space_out  # frozen-in-time: residual from the input
        h = LayerNormTorch(name="norm2")(space_residual)
        h = _dense(self.quantized, 4 * self.dim, self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = _dense(self.quantized, self.dim, self.dtype, name="mlp_fc2")(h)
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
    fused_attention: bool = False
    quantized: Any = False

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
                               fused_attention=self.fused_attention,
                               quantized=self.quantized,
                               name=f"blocks_{i}")(
                x, frames=f, patches=patches_per_frame)
        x = LayerNormTorch(name="norm")(x)
        return x[:, 0]
