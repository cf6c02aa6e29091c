"""Every shipped config group file must compose without errors."""

import os

import pytest

from fitclip_tpu.cli.main import DEFAULT_CONFIG_DIR
from fitclip_tpu.config_engine import compose


def _group_names(group):
    directory = os.path.join(DEFAULT_CONFIG_DIR, group)
    return sorted(f[:-5] for f in os.listdir(directory) if f.endswith(".yaml"))


@pytest.mark.parametrize("name", _group_names("data"))
def test_all_data_configs_compose(name):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", f"data={name}"])
    assert "_target_" in cfg["data"]


@pytest.mark.parametrize("name", [n for n in _group_names("encoder")
                                  if n not in ("clip_from_pretrained", "wise")])
def test_all_encoder_configs_compose(name):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", f"encoder={name}", "data=msrvtt"])
    assert "_target_" in cfg["encoder"]


def test_drift_eval_trainer_composes():
    cfg = compose(DEFAULT_CONFIG_DIR, "drift_eval_trainer",
                  ["command=train", "encoder=clip_vit_b_16"])
    assert cfg["optimized_metric_name"] == "r10_cc3m"
    assert cfg["data"]["_target_"].endswith("TrainAndEvalDataModules")
    assert cfg["data"]["train_data_module"]["_target_"].endswith("WebVidDataModule")
    assert cfg["data"]["eval_data_module"]["_target_"].endswith("EvalDataModuleGroup")


def test_hparam_search_group_composes():
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=train", "encoder=clip_vit_b_16", "data=msrvtt",
                   "hparam_search=random"])
    assert cfg["hparam_search"]["n_trials"] == 100
    assert "trainer.gradient_clip_val" in cfg["hparam_search"]["search_space"]
