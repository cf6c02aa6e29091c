"""Random hparam sweeper tests (no model runs — a stub objective)."""

import numpy as np
import pytest

from fitclip_tpu.cli.sweep import run_sweep, sample_value


def test_sample_value_kinds():
    rng = np.random.default_rng(0)
    u = sample_value({"type": "uniform", "low": 1, "high": 2}, rng)
    assert 1 <= u <= 2
    lg = sample_value({"type": "loguniform", "low": 0.1, "high": 10}, rng)
    assert 0.1 <= lg <= 10
    i = sample_value({"type": "int", "low": 3, "high": 5}, rng)
    assert i in (3, 4, 5)
    c = sample_value({"type": "choice", "options": ["a", "b"]}, rng)
    assert c in ("a", "b")


def test_run_sweep_maximizes():
    cfg = {
        "command": "train",
        "trainer": {},
        "hparam_search": {
            "n_trials": 20, "direction": "maximize", "seed": 1,
            "search_space": {"trainer.gradient_clip_val":
                             {"type": "uniform", "low": 0.0, "high": 1.0}},
        },
    }
    seen = []

    def objective(trial_cfg):
        assert "hparam_search" not in trial_cfg
        value = trial_cfg["trainer"]["gradient_clip_val"]
        seen.append(value)
        return -(value - 0.7) ** 2  # peak at 0.7

    best_value, best_params = run_sweep(cfg, objective)
    assert len(seen) == 20
    best_clip = best_params["trainer.gradient_clip_val"]
    assert abs(best_clip - 0.7) == pytest.approx(
        min(abs(v - 0.7) for v in seen), abs=1e-9)
    assert best_value <= 0
