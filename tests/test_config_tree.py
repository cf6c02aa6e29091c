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


# Configs with mandatory (???) values get them supplied as a user would.
ENCODER_MANDATORY_OVERRIDES = {
    "clip_from_pretrained": ["encoder.checkpoint_path=/tmp/ckpt.pt"],
    "slip": ["encoder.model=SLIP_VITB16"],
    "slip_from_pretrained": ["encoder.checkpoint_path=/tmp/ckpt.pt"],
    "wise": ["+encoder@encoder.model1=clip_vit_b_16",
             "+encoder@encoder.model2=clip_vit_b_16"],
}


@pytest.mark.parametrize("name", _group_names("encoder"))
def test_all_encoder_configs_compose(name):
    """Every reference-named encoder config composes AND its target is
    importable (the evaluate-any-released-checkpoint-by-name capability)."""
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", f"encoder={name}", "data=msrvtt",
                   *ENCODER_MANDATORY_OVERRIDES.get(name, [])])
    encoder = cfg["encoder"]
    targets = ([encoder["_target_"]] if "_target_" in encoder
               else [encoder["model1"]["_target_"], encoder["model2"]["_target_"]])
    for target in targets:
        module_name, attr = str(target).rsplit(".", 1)
        module = __import__(module_name, fromlist=[attr])
        assert hasattr(module, attr), f"{name}: target {target} not importable"


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
