"""Pure-jnp eval forward for CLIP: one megakernel per transformer layer.

Consumes the SAME parameter trees as the flax CLIPModel — the int8 tree from
quantize_clip_params (+ calibration) or the plain float tree — and runs the
transformer as a ``jax.lax.scan`` over scan-stacked layer params with each
layer executed by ONE Pallas kernel (``ops/block.fused_int8_layer`` or its
float twin ``fused_bf16_layer``, chosen by the tree's leaves): all weights
VMEM-resident, the carry aliased in place, no intermediate HBM round trips.
This sidesteps flax module plumbing on the hot path so the kernel owns the
whole block. Inference-only — the layer kernels define no VJP.

Embedding math mirrors models/clip/model.py exactly (unfold patch embedding,
fp32-stat LayerNorms, argmax-EOT text pooling); numeric agreement with the
flax quantized path is asserted by tests/test_block_kernel.py and the on-TPU
int8-vs-bf16 cosine gate in bench.py.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from fitclip_tpu.models.clip.model import CLIPConfig
from fitclip_tpu.ops.block import fused_bf16_layer, fused_int8_layer

PRECISION = jax.lax.Precision.HIGHEST
LN_EPS = 1e-5


def _layer_norm(x, node, out_dtype, eps: float = LN_EPS):
    """fp32-stat LayerNorm matching model.LayerNormFp32 (both variants keep
    statistics and normalize arithmetic in fp32)."""
    scale = node["ln"]["scale"].astype(jnp.float32)
    bias = node["ln"]["bias"].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


def _run_blocks(x, blocks: Dict[str, Any], heads: int, causal: bool,
                quick_gelu: bool, block_rows: int, ln_eps: float = LN_EPS,
                seq_valid=None):
    # Quantized trees carry kernel_q leaves; float trees carry kernel.
    layer_fn = (fused_int8_layer
                if "kernel_q" in blocks["attn"]["in_proj"] else fused_bf16_layer)

    def body(h, layer):
        return layer_fn(h, layer, heads, causal=causal,
                        quick_gelu=quick_gelu,
                        block_rows=block_rows, ln_eps=ln_eps,
                        seq_valid=seq_valid), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def encode_frames_fast(params, frames: jnp.ndarray, config: CLIPConfig,
                       dtype=jnp.bfloat16, block_rows: int = 1,
                       pad_seq: int = 0) -> jnp.ndarray:
    """(N, H, W, 3) frames (uint8-folded or normalized floats) -> (N, D)."""
    cfg = config.vision
    v = params["visual"]
    b = frames.shape[0]
    g, p = cfg.grid_size, cfg.patch_size

    # Patch embedding as a strided conv: XLA folds the im2col into the MXU op,
    # where the flax model's explicit unfold transpose costs ~4.5 ms of pure
    # relayout at 512-frame batches (profiled). The stored (p*p*3, width)
    # kernel rows are ordered (ph, pw, c), i.e. exactly HWIO when reshaped.
    x = frames.astype(dtype)
    kern = v["patch_embed"]["kernel"].astype(dtype).reshape(p, p, 3, cfg.width)
    x = jax.lax.conv_general_dilated(
        x, kern, window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=PRECISION)

    # Prologue restructured for fusion (profiled: the concat between the bias
    # add and the positional add forced XLA into 3 separate full-tensor HBM
    # passes + a copy, ~1.4 ms at 512 frames). LayerNorm is per-token, so
    # ln_pre commutes with the row concat: apply bias+pos+LN to the patch rows
    # in ONE fused conv epilogue, compute the (batch-invariant) CLS row once
    # at (1, width) and broadcast, then concat the already-normalized rows.
    pos = v["positional_embedding"].astype(dtype)
    patch_shift = v["patch_embed"]["bias"].astype(dtype) + pos[1:]
    x = _layer_norm(x.reshape(b, g * g, cfg.width) + patch_shift,
                    v["ln_pre"], dtype)
    cls_row = _layer_norm(
        (v["class_embedding"].astype(dtype) + pos[:1])[None], v["ln_pre"],
        dtype)
    x = jnp.concatenate([jnp.broadcast_to(cls_row, (b, 1, cfg.width)), x],
                        axis=1)
    # Lane padding (round-4, VERDICT r3 #5): odd non-128-multiple L (the
    # ViT-L/14@336px worst case, L=577) pads to pad_seq dead rows at the
    # tail; the kernels mask them as attention keys (seq_valid) and the CLS
    # row 0 read below never sees them. Costs pad_seq/L extra row FLOPs.
    seq = x.shape[1]
    seq_valid = None
    if pad_seq and pad_seq > seq:
        x = jnp.pad(x, ((0, 0), (0, pad_seq - seq), (0, 0)))
        seq_valid = seq
    x = _run_blocks(x, v["transformer"]["blocks"], cfg.heads, causal=False,
                    quick_gelu=config.quick_gelu, block_rows=block_rows,
                    seq_valid=seq_valid)
    x = _layer_norm(x[:, 0], v["ln_post"], dtype)
    return jnp.matmul(x, v["proj"].astype(dtype), precision=PRECISION)


def encode_text_fast(params, input_ids: jnp.ndarray, config: CLIPConfig,
                     dtype=jnp.bfloat16, block_rows: int = 1) -> jnp.ndarray:
    """(B, context) int32 token ids -> (B, D); EOT = argmax id per row."""
    cfg = config.text
    t = params["text"]
    x = t["token_embedding"][input_ids].astype(dtype)
    x = x + t["positional_embedding"][: x.shape[1]].astype(dtype)
    x = _run_blocks(x, t["transformer"]["blocks"], cfg.heads, causal=True,
                    quick_gelu=config.quick_gelu, block_rows=block_rows)
    x = _layer_norm(x, t["ln_final"], dtype)
    eot = jnp.argmax(input_ids, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.matmul(x, t["text_projection"].astype(dtype), precision=PRECISION)


# The fast path dispatches on the tree (int8 kernel_q vs float kernel);
# the original names remain as aliases.
encode_frames_int8 = encode_frames_fast
encode_text_int8 = encode_text_fast
