"""Config engine tests: composition, overrides, interpolation, instantiate."""

import os

import pytest
import yaml

from fitclip_tpu.config_engine import compose, expand_multirun, instantiate
from fitclip_tpu.config_engine.compose import ConfigError


@pytest.fixture()
def config_dir(tmp_path):
    def write(rel, content):
        path = tmp_path / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(yaml.safe_dump(content))

    write("trainer.yaml", {
        "defaults": [{"data": None}, {"encoder": None},
                     {"trainer/callbacks": "default"}, "_self_"],
        "command": "???",
        "seed": 42,
        "model": {"init_temperature": 0.015, "fit_temperature": False},
        "trainer": {"devices": 1, "precision": 32},
        "paths": {"output": "${oc.env:TEST_SWEEP_DIR,/tmp/out}"},
    })
    write("encoder/clip_vit_b_16.yaml", {"_target_": "collections.OrderedDict",
                                         "name": "ViT-B/16"})
    write("encoder/wise.yaml", {"weight_for_2": 0.4})
    write("data/msrvtt.yaml", {"name": "msrvtt", "batch_size": 32})
    write("data/webvid.yaml", {"name": "webvid", "batch_size": 32})
    write("trainer/callbacks/default.yaml", {"early_stopping": {"patience": 3}})
    return str(tmp_path)


def test_group_selection_and_defaults(config_dir):
    cfg = compose(config_dir, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", "data=msrvtt"])
    assert cfg["command"] == "evaluate"
    assert cfg["encoder"]["name"] == "ViT-B/16"
    assert cfg["data"]["name"] == "msrvtt"
    assert cfg["trainer"]["callbacks"]["early_stopping"]["patience"] == 3
    assert cfg["model"]["init_temperature"] == 0.015


def test_missing_mandatory_raises(config_dir):
    with pytest.raises(ConfigError, match="command"):
        compose(config_dir, "trainer", ["encoder=clip_vit_b_16", "data=msrvtt"])


def test_value_overrides_scalar_types(config_dir):
    cfg = compose(config_dir, "trainer",
                  ["command=train", "encoder=clip_vit_b_16", "data=msrvtt",
                   "trainer.devices=-1", "++model.lr=3e-6", "+model.extra=[1,2]"])
    assert cfg["trainer"]["devices"] == -1
    assert cfg["model"]["lr"] == 3e-6
    assert cfg["model"]["extra"] == [1, 2]


def test_unknown_plain_override_raises(config_dir):
    with pytest.raises(ConfigError):
        compose(config_dir, "trainer",
                ["command=train", "encoder=clip_vit_b_16", "data=msrvtt",
                 "model.nonexistent=1"])


def test_package_redirection(config_dir):
    cfg = compose(config_dir, "trainer",
                  ["command=train", "data=msrvtt",
                   "+encoder@encoder.student=clip_vit_b_16",
                   "+encoder@encoder.teacher=clip_vit_b_16"])
    assert cfg["encoder"]["student"]["name"] == "ViT-B/16"
    assert cfg["encoder"]["teacher"]["name"] == "ViT-B/16"


def test_env_interpolation(config_dir):
    os.environ["TEST_SWEEP_DIR"] = "/data/sweeps"
    try:
        cfg = compose(config_dir, "trainer",
                      ["command=evaluate", "encoder=clip_vit_b_16", "data=msrvtt"])
        assert cfg["paths"]["output"] == "/data/sweeps"
    finally:
        del os.environ["TEST_SWEEP_DIR"]
    cfg = compose(config_dir, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", "data=msrvtt"])
    assert cfg["paths"]["output"] == "/tmp/out"


def test_delete_override(config_dir):
    cfg = compose(config_dir, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", "data=msrvtt",
                   "~model.init_temperature"])
    assert "init_temperature" not in cfg["model"]


def test_multirun_expansion():
    runs = expand_multirun(["command=evaluate", "data=msrvtt,webvid,ucf101"])
    assert len(runs) == 3
    assert runs[0] == ["command=evaluate", "data=msrvtt"]
    assert runs[2] == ["command=evaluate", "data=ucf101"]
    # bracketed lists stay intact
    assert expand_multirun(["a=[1,2]"]) == [["a=[1,2]"]]


def test_instantiate_nested_and_partial():
    obj = instantiate({
        "_target_": "collections.OrderedDict",
        "inner": {"_target_": "builtins.tuple", "_args_": [[1, 2]]},
    })
    assert obj["inner"] == (1, 2)

    partial = instantiate({"_target_": "builtins.int", "_partial_": True})
    assert partial("7") == 7


def test_instantiate_kwargs_override():
    result = instantiate({"_target_": "builtins.round", "_args_": [3.14159]}, ndigits=2)
    assert result == 3.14
