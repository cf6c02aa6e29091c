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
import numpy as np
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


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "data",
                   min_leaf_size: int = 4096) -> Any:
    """ZeRO-3 / FSDP-style shardings for a whole TrainState pytree.

    The reference holds a full parameter + AdamW-moment replica per GPU (PL
    DDP — SURVEY §2.8); TPU-natively the same jitted step runs fully sharded
    by annotating the state: every large leaf is split over the ``data`` axis
    on its largest evenly-divisible dim, and GSPMD inserts the per-layer
    all-gathers (forward/backward) and keeps the optimizer update local to
    each shard. Per-chip state memory drops ~Nx on an N-chip data mesh, which
    is the difference between fitting and OOMing ViT-L towers + fp32 AdamW
    moments.

    Composes with the Megatron TP rules: on a ("data", "model") mesh a leaf
    first gets its TP spec, then the data axis lands on the largest remaining
    divisible dim (the weight becomes 2-D sharded, exactly the Megatron+ZeRO
    layout). Small leaves (LN vectors, scalars, frozen-moment placeholders)
    replicate — gathering them costs more than holding them.
    """
    if axis not in mesh.axis_names or mesh.shape[axis] == 1:
        raise ValueError(f"mesh has no nontrivial {axis!r} axis: {mesh.shape}")
    n = mesh.shape[axis]
    has_tp = MODEL_AXIS in mesh.axis_names

    def assign(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        size = int(np.prod(shape)) if shape else 1
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        base = _spec_for(path_str, len(shape)) if has_tp and shape else P()
        if size < min_leaf_size:
            return NamedSharding(mesh, base)
        taken = tuple(base) + (None,) * (len(shape) - len(tuple(base)))
        best = None
        for dim, extent in enumerate(shape):
            if taken[dim] is None and extent % n == 0 and (
                    best is None or extent > shape[best]):
                best = dim
        if best is None:
            return NamedSharding(mesh, base)
        spec = list(taken)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(assign, tree)
