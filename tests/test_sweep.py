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


def test_tpe_beats_random_on_smooth_objective():
    """TPE must find a better optimum than random search on the same budget
    for a smooth unimodal objective (log-scale quadratic)."""
    import math

    from fitclip_tpu.cli.sweep import run_sweep

    space = {"optimizer.lr": {"type": "loguniform", "low": 1e-6, "high": 1.0}}

    def objective(cfg):
        lr = cfg["optimizer"]["lr"]
        return -(math.log10(lr) + 3.0) ** 2  # optimum at lr = 1e-3

    def make_cfg(sampler):
        return {"hparam_search": {"sampler": sampler, "n_trials": 40,
                                  "n_startup_trials": 8, "seed": 3,
                                  "direction": "maximize",
                                  "search_space": space}}

    best_tpe, params_tpe = run_sweep(make_cfg("tpe"), objective)
    best_random, _ = run_sweep(make_cfg("random"), objective)
    assert best_tpe >= best_random
    assert abs(math.log10(params_tpe["optimizer.lr"]) + 3.0) < 0.5


def test_tpe_categorical_and_int():
    from fitclip_tpu.cli.sweep import run_sweep

    space = {
        "model.arch": {"type": "choice", "options": ["a", "b", "c"]},
        "data.batch_size": {"type": "int", "low": 1, "high": 64},
    }

    def objective(cfg):
        score = {"a": 0.0, "b": 2.0, "c": 1.0}[cfg["model"]["arch"]]
        return score - abs(cfg["data"]["batch_size"] - 32) / 32.0

    cfg = {"hparam_search": {"sampler": "tpe", "n_trials": 60,
                             "n_startup_trials": 10, "seed": 0,
                             "direction": "maximize", "search_space": space}}
    best, params = run_sweep(cfg, objective)
    assert params["model.arch"] == "b"
    assert abs(params["data.batch_size"] - 32) <= 12


def test_unknown_sampler_rejected():
    import pytest as _pytest

    from fitclip_tpu.cli.sweep import run_sweep

    cfg = {"hparam_search": {"sampler": "genetic", "search_space": {}}}
    with _pytest.raises(ValueError, match="random|tpe"):
        run_sweep(cfg, lambda c: 0.0)
