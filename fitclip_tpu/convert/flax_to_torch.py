"""Inverse converter: Flax CLIP params -> OpenAI-schema torch state dict.

Enables round-tripping: checkpoints trained here can be exported for the
reference's eval tooling (scripts/checkpoint_to_state_dict.py surface), and
the pair (torch->flax, flax->torch) is testable as an identity.
"""

from typing import Dict

import numpy as np


def _unstack(tree, layer):
    import jax

    return jax.tree_util.tree_map(lambda a: np.asarray(a)[layer], tree)


def _ln(out, prefix, node):
    out[f"{prefix}.weight"] = np.asarray(node["ln"]["scale"])
    out[f"{prefix}.bias"] = np.asarray(node["ln"]["bias"])


def _tower_blocks(out, prefix, blocks):
    num_layers = np.asarray(blocks["ln_1"]["ln"]["scale"]).shape[0]
    for i in range(num_layers):
        b = _unstack(blocks, i)
        p = f"{prefix}.resblocks.{i}"
        out[f"{p}.attn.in_proj_weight"] = b["attn"]["in_proj"]["kernel"].T
        out[f"{p}.attn.in_proj_bias"] = b["attn"]["in_proj"]["bias"]
        out[f"{p}.attn.out_proj.weight"] = b["attn"]["out_proj"]["kernel"].T
        out[f"{p}.attn.out_proj.bias"] = b["attn"]["out_proj"]["bias"]
        _ln(out, f"{p}.ln_1", b["ln_1"])
        _ln(out, f"{p}.ln_2", b["ln_2"])
        out[f"{p}.mlp.c_fc.weight"] = b["mlp_fc"]["kernel"].T
        out[f"{p}.mlp.c_fc.bias"] = b["mlp_fc"]["bias"]
        out[f"{p}.mlp.c_proj.weight"] = b["mlp_proj"]["kernel"].T
        out[f"{p}.mlp.c_proj.bias"] = b["mlp_proj"]["bias"]


def clip_torch_state_dict_from_params(params) -> Dict[str, np.ndarray]:
    """Flax CLIPModel params -> OpenAI `clip` package naming (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    visual = params["visual"]
    kernel = np.asarray(visual["patch_embed"]["kernel"])  # (p*p*3, width)
    patch = int(round((kernel.shape[0] // 3) ** 0.5))
    width = kernel.shape[1]
    out["visual.conv1.weight"] = kernel.reshape(patch, patch, 3, width).transpose(3, 2, 0, 1)
    bias = np.asarray(visual["patch_embed"]["bias"])
    if np.abs(bias).max() > 0:
        # OpenAI conv1 has no bias; preserve only a real one (e.g. after
        # pixel-normalization folding) under a framework-specific key.
        out["visual.conv1.bias"] = bias
    out["visual.class_embedding"] = np.asarray(visual["class_embedding"])
    out["visual.positional_embedding"] = np.asarray(visual["positional_embedding"])
    _ln(out, "visual.ln_pre", visual["ln_pre"])
    _tower_blocks(out, "visual.transformer", visual["transformer"]["blocks"])
    _ln(out, "visual.ln_post", visual["ln_post"])
    out["visual.proj"] = np.asarray(visual["proj"])

    text = params["text"]
    out["token_embedding.weight"] = np.asarray(text["token_embedding"])
    out["positional_embedding"] = np.asarray(text["positional_embedding"])
    _tower_blocks(out, "transformer", text["transformer"]["blocks"])
    _ln(out, "ln_final", text["ln_final"])
    out["text_projection"] = np.asarray(text["text_projection"])
    return out
