"""Whole-layer megakernel eval forward for SLIP (int8 W8A8 or bf16).

SLIP's towers are structurally the CLIP transformer (models/slip.py reuses
the in-tree ``Transformer``), so both ride the same per-layer Pallas
megakernel as CLIP's fast path (ops/block.py) with two deltas threaded
through as kernel constants: the timm vision tower uses exact GELU
(quick_gelu=False) and LayerNorm eps 1e-6, and there is no ln_pre — timm
blocks start straight after cls+pos. Consumes the SAME parameter trees as
the flax SlipModel (int8 trees from ops.quant.quantize_clip_params, which
walks any tree with the block dense names, or plain float trees).

Embedding math mirrors models/slip.py TimmViT/SlipModel exactly; numeric
agreement with the flax path is asserted by tests/test_slip_fast.py and the
on-TPU int8-vs-bf16 cosine gate in scripts/bench_families.py. Inference-only.

Reference being matched: the vendored timm-style ViT + CLIP text tower in
/root/reference/aligner/encoder/slip.py:399-544 (SLIP_VITB16 et al.).
"""

import jax
import jax.numpy as jnp

from fitclip_tpu.models.clip.fast_eval import PRECISION, _layer_norm, _run_blocks
from fitclip_tpu.models.slip import SlipConfig

VISION_LN_EPS = 1e-6
TEXT_LN_EPS = 1e-5


def encode_frames_fast(params, frames: jnp.ndarray, config: SlipConfig,
                       dtype=jnp.bfloat16, block_rows: int = 1) -> jnp.ndarray:
    """(N, H, W, 3) imagenet-normalized frames -> (N, D) SLIP image embeddings."""
    cfg = config
    v = params["visual"]
    b = frames.shape[0]
    g, p = cfg.image_size // cfg.patch_size, cfg.patch_size

    # Patch embedding as a strided conv (same trick as the CLIP fast path:
    # XLA folds the im2col into the MXU op instead of an explicit unfold
    # transpose). TimmViT's (p*p*3, width) dense kernel rows are ordered
    # (ph, pw, c) — exactly HWIO when reshaped.
    x = frames.astype(dtype)
    kern = v["patch_embed"]["kernel"].astype(dtype).reshape(p, p, 3, cfg.vision_width)
    x = jax.lax.conv_general_dilated(
        x, kern, window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=PRECISION)

    # timm prologue: bias + cls token + pos embed (pos row 0 belongs to cls),
    # NO pre-LN. The cls row is batch-invariant: build it once at (1, width).
    pos = v["pos_embed"].astype(dtype)
    patch_shift = v["patch_embed"]["bias"].astype(dtype) + pos[1:]
    x = x.reshape(b, g * g, cfg.vision_width) + patch_shift
    cls_row = (v["cls_token"].astype(dtype) + pos[0])[None, None]
    x = jnp.concatenate([jnp.broadcast_to(cls_row, (b, 1, cfg.vision_width)), x],
                        axis=1)
    x = _run_blocks(x, v["blocks"]["blocks"], cfg.vision_heads, causal=False,
                    quick_gelu=False, block_rows=block_rows,
                    ln_eps=VISION_LN_EPS)
    x = _layer_norm(x[:, 0], v["norm"], dtype, eps=VISION_LN_EPS)
    return jnp.matmul(x, params["image_projection"].astype(dtype),
                      precision=PRECISION)


def encode_text_fast(params, input_ids: jnp.ndarray, config: SlipConfig,
                     dtype=jnp.bfloat16, block_rows: int = 1) -> jnp.ndarray:
    """(B, context) int32 token ids -> (B, D); EOT = argmax id per row.
    SLIP's text tower is the CLIP one (QuickGELU, eps 1e-5, causal)."""
    cfg = config.text
    x = params["token_embedding"][input_ids].astype(dtype)
    x = x + params["positional_embedding"][: x.shape[1]].astype(dtype)
    x = _run_blocks(x, params["transformer"]["blocks"], cfg.heads, causal=True,
                    quick_gelu=True, block_rows=block_rows, ln_eps=TEXT_LN_EPS)
    x = _layer_norm(x, params["ln_final"], dtype, eps=TEXT_LN_EPS)
    eot = jnp.argmax(input_ids, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.matmul(x, params["text_projection"].astype(dtype),
                      precision=PRECISION)
