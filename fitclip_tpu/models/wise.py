"""WiSE-FT weight-space ensembling over JAX pytrees.

Reference semantics (``aligner/wise.py:10-23``): elementwise
``(1 - w) * params1 + w * params2`` over identically-structured parameter
sets. With pytrees this is a single ``tree_map``; structure equality is the
tree-structure check the reference did with state-dict key sets.
"""

from typing import Any

import jax


def wise_params(params1: Any, params2: Any, weight_for_2: float = 0.5) -> Any:
    """Linear interpolation of two parameter pytrees (released recipe: 0.4)."""
    struct1 = jax.tree_util.tree_structure(params1)
    struct2 = jax.tree_util.tree_structure(params2)
    if struct1 != struct2:
        raise ValueError(
            f"WiSE-FT requires identical parameter structures, got {struct1} vs {struct2}")
    return jax.tree_util.tree_map(
        lambda a, b: (1 - weight_for_2) * a + weight_for_2 * b, params1, params2)
