"""Recursive ``_target_`` instantiation (hydra.utils.instantiate subset).

Supports: dotted-path import, nested dict/list instantiation, ``_partial_``
(returns functools.partial), ``_args_`` positionals, kwargs overrides at call
time, and ``_convert_`` (accepted and ignored — plain dicts are already
returned everywhere, which is what ``_convert_="all"`` asks for).
"""

import functools
import importlib
from typing import Any, Mapping


def _import_target(path: str) -> Any:
    module_path, _, attr = path.rpartition(".")
    if not module_path:
        raise ImportError(f"_target_ '{path}' is not a dotted path")
    try:
        module = importlib.import_module(module_path)
        return getattr(module, attr)
    except AttributeError:
        # target may be a nested attribute (module.Class.method)
        parent = _import_target(module_path)
        return getattr(parent, attr)


def instantiate(node: Any, *args: Any, **kwargs: Any) -> Any:
    if isinstance(node, Mapping):
        if "_target_" in node:
            target = _import_target(node["_target_"])
            partial = bool(node.get("_partial_", False))
            positional = [instantiate(a) for a in node.get("_args_", ())]
            call_kwargs = {
                key: instantiate(value)
                for key, value in node.items()
                if key not in ("_target_", "_partial_", "_args_", "_convert_", "_recursive_")
            }
            call_kwargs.update(kwargs)
            positional = list(args) + positional
            if partial:
                return functools.partial(target, *positional, **call_kwargs)
            return target(*positional, **call_kwargs)
        return {key: instantiate(value) for key, value in node.items()}
    if isinstance(node, list):
        return [instantiate(value) for value in node]
    return node
