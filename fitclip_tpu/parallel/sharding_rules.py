"""Parameter sharding rules: tensor parallelism over a ("data", "model") mesh.

GSPMD-style TP: annotate weight shardings (Megatron layout — column-parallel
QKV/FC-in, row-parallel out-proj/FC-out, vocab-parallel embeddings) and let
XLA propagate activations shardings and insert the collectives. Not needed for
parity at ViT-B scale (SURVEY §2.8 — the reference is DP-only), but it is how
this framework scales past a chip's HBM: the same jitted step runs dp-only,
dp+tp, or tp-only purely by changing the mesh and these annotations.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# (path-suffix, partition spec builder) — first match wins. Specs are given
# for the *trailing* dims; leading (scan-layer) dims stay unsharded.
_RULES = [
    ("attn/in_proj/kernel", ("replicated", MODEL_AXIS)),   # column parallel
    ("attn/in_proj/bias", (MODEL_AXIS,)),
    ("attn/out_proj/kernel", (MODEL_AXIS, "replicated")),  # row parallel
    ("mlp_fc/kernel", ("replicated", MODEL_AXIS)),
    ("mlp_fc/bias", (MODEL_AXIS,)),
    ("mlp_proj/kernel", (MODEL_AXIS, "replicated")),
    ("token_embedding", (MODEL_AXIS, "replicated")),       # vocab parallel
]


def _spec_for(path_str: str, ndim: int) -> P:
    for suffix, trailing in _RULES:
        if path_str.endswith(suffix):
            axes = [None if axis == "replicated" else axis for axis in trailing]
            if len(axes) > ndim:
                break
            return P(*([None] * (ndim - len(axes)) + axes))
    return P()


def tensor_parallel_shardings(params: Any, mesh: Mesh) -> Any:
    """A pytree of NamedShardings for the CLIP parameter tree."""
    if MODEL_AXIS not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)

    def assign(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, _spec_for(path_str, leaf.ndim))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        jax.device_put, params, tensor_parallel_shardings(params, mesh))
