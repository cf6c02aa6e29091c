"""Random hyperparameter search (the reference's Optuna sweeper role,
config/hparam_search/optuna.yaml: random sampler, maximize, n_trials).

Each trial deep-copies the composed config, samples the search space, runs the
command, and reads the optimized metric from the run's return value.
"""

import copy
import logging
import math
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

LOGGER = logging.getLogger(__name__)


def sample_value(spec: Mapping[str, Any], rng: np.random.Generator):
    kind = spec.get("type", "uniform")
    if kind == "uniform":
        return float(rng.uniform(spec["low"], spec["high"]))
    if kind == "loguniform":
        return float(math.exp(rng.uniform(math.log(spec["low"]),
                                          math.log(spec["high"]))))
    if kind == "int":
        return int(rng.integers(spec["low"], spec["high"] + 1))
    if kind == "choice":
        options = spec["options"]
        return options[int(rng.integers(0, len(options)))]
    raise ValueError(f"Unknown search-space type: {kind}")


def _set_dotted(cfg: Dict[str, Any], path: str, value) -> None:
    node = cfg
    keys = path.split(".")
    for key in keys[:-1]:
        node = node.setdefault(key, {})
    node[keys[-1]] = value


def run_sweep(cfg: Dict[str, Any], run_fn) -> Tuple[Optional[float], Dict[str, Any]]:
    """Returns (best_value, best_params)."""
    sweep_cfg = cfg["hparam_search"]
    n_trials = int(sweep_cfg.get("n_trials", 10))
    direction = sweep_cfg.get("direction", "maximize")
    space = sweep_cfg.get("search_space", {})
    rng = np.random.default_rng(int(sweep_cfg.get("seed", 0)))

    best_value: Optional[float] = None
    best_params: Dict[str, Any] = {}
    for trial in range(n_trials):
        trial_cfg = copy.deepcopy(cfg)
        trial_cfg.pop("hparam_search", None)
        sampled = {path: sample_value(spec, rng) for path, spec in space.items()}
        for path, value in sampled.items():
            _set_dotted(trial_cfg, path, value)
        LOGGER.info("trial %d/%d: %s", trial + 1, n_trials, sampled)
        value = run_fn(trial_cfg)
        if value is None:
            LOGGER.warning("trial %d returned no optimized metric "
                           "(set optimized_metric_name)", trial + 1)
            continue
        better = (best_value is None or
                  (value > best_value if direction == "maximize" else value < best_value))
        if better:
            best_value, best_params = float(value), sampled
        LOGGER.info("trial %d value=%s best=%s", trial + 1, value, best_value)
    LOGGER.info("sweep done: best=%s with %s", best_value, best_params)
    return best_value, best_params
