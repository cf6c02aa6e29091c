"""End-to-end CLI tests: compose the real config tree, then run commands
against synthetic fixtures with a tiny encoder."""

import json
import os

import numpy as np
import pytest

from fitclip_tpu.config_engine import compose
from fitclip_tpu.cli.main import DEFAULT_CONFIG_DIR, parse_args, run

from tests.test_datasets import _write_video  # reuse fixture helper


@pytest.fixture(scope="module")
def vocab_paths(tmp_path_factory):
    from fitclip_tpu.models.clip.tokenizer import write_tiny_test_vocab

    directory = tmp_path_factory.mktemp("vocab")
    return write_tiny_test_vocab(str(directory), ["a", "cat", "video", "of"] * 3)


@pytest.fixture(scope="module")
def msrvtt_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    videos = root / "videos" / "all"
    for i in range(5):
        _write_video(str(videos / f"video{i}.avi"))
    (root / "structured-symlinks").mkdir()
    (root / "structured-symlinks" / "val_list_jsfusion.txt").write_text(
        "\n".join(f"video{i}" for i in range(5)))
    (root / "structured-symlinks" / "train_list_jsfusion.txt").write_text("video0\n")
    (root / "annotation").mkdir()
    (root / "annotation" / "MSR_VTT.json").write_text(json.dumps({
        "annotations": [{"image_id": f"video{i}", "caption": f"a cat video of {i}"}
                        for i in range(5)]}))
    os.environ["MSRVTT_PATH"] = str(root)
    return str(root)


def _tiny_encoder_cfg(vocab_paths):
    merges, vocab = vocab_paths
    return {"_target_": "fitclip_tpu.models.clip.load.load_tiny_test_encoder",
            "bpe_path": merges, "vocab_path": vocab}


def test_parse_args():
    name, _, multirun, overrides = parse_args(
        ["--config-name", "teacher_student_trainer", "-m", "command=train",
         "data=msrvtt,webvid"])
    assert name == "teacher_student_trainer"
    assert multirun
    assert overrides == ["command=train", "data=msrvtt,webvid"]


def test_compose_real_config_tree(msrvtt_env):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", "data=msrvtt"])
    assert cfg["encoder"]["name"] == "ViT-B/16"
    assert cfg["data"]["_target_"].endswith("MsrVttDataModule")
    assert cfg["data"]["base_path"] == msrvtt_env
    assert cfg["model"]["init_temperature"] == 0.015
    assert cfg["trainer"]["callbacks"]["early_stopping"]["patience"] == 3


def test_compose_teacher_student_tree(msrvtt_env):
    cfg = compose(DEFAULT_CONFIG_DIR, "teacher_student_trainer",
                  ["command=train",
                   "+encoder@encoder.student=clip_vit_b_16",
                   "+encoder@encoder.teacher=clip_vit_b_32",
                   "data=mixed_batch_webvid_4_5k_all",
                   "++model.labeled_dataset_loss_share=0.9999"])
    assert cfg["encoder"]["student"]["name"] == "ViT-B/16"
    assert cfg["encoder"]["teacher"]["name"] == "ViT-B/32"
    assert cfg["model"]["labeled_dataset_loss_share"] == 0.9999
    dms = cfg["data"]["data_modules"]
    assert dms["labeled"]["train_filter_videos_from_info_file"] is True
    assert dms["labeled"]["batch_size"] == 8
    assert cfg["data"]["train_sequence_sizes"] == {"labeled": 8, "unlabeled": 8}


def test_run_evaluate_end_to_end(msrvtt_env, vocab_paths, capsys):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", "data=msrvtt",
                   "data.eval_batch_size=4", "+data.num_threads=2"])
    cfg["encoder"] = _tiny_encoder_cfg(vocab_paths)
    run(cfg)
    printed = capsys.readouterr().out
    metrics = json.loads(printed[printed.index("{"):])
    assert set(metrics) == {"r1", "r5", "r10", "mr"}
    assert 1 <= metrics["mr"] <= 5


def test_run_predict_end_to_end(msrvtt_env, vocab_paths, tmp_path):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=predict", "encoder=clip_vit_b_16", "data=msrvtt",
                   "data.eval_batch_size=4", "+data.num_threads=2",
                   f"+output_path={tmp_path}/predictions.pt"])
    cfg["encoder"] = _tiny_encoder_cfg(vocab_paths)
    run(cfg)
    import torch

    predictions = torch.load(str(tmp_path / "predictions.pt"), weights_only=False)
    assert predictions["encoded_videos"].shape == (5, 32)
    assert len(predictions["video_ids"]) == 5


def test_run_train_contrastive_end_to_end(msrvtt_env, vocab_paths, tmp_path):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=train", "encoder=clip_vit_b_16", "data=msrvtt",
                   "+data.batch_size=2", "+data.num_threads=2",
                   "data.eval_batch_size=4",
                   "trainer.max_epochs=1", "optimizer.lr=1e-4",
                   f"+log_dir={tmp_path}/logs",
                   f"trainer.callbacks.checkpoint.dirpath={tmp_path}/ckpt",
                   "trainer.callbacks.checkpoint.every_n_epochs=1"])
    cfg["encoder"] = _tiny_encoder_cfg(vocab_paths)
    cfg["model"]["fit_temperature"] = True
    run(cfg)
    assert os.path.isdir(str(tmp_path / "ckpt" / "last"))
    log_file = tmp_path / "logs" / "metrics.jsonl"
    assert log_file.exists()
    lines = [json.loads(line) for line in log_file.read_text().splitlines()]
    assert any("r1" in line for line in lines)


def test_run_train_fsdp_end_to_end(msrvtt_env, vocab_paths, tmp_path, caplog):
    """++trainer.fsdp=true through the real CLI: the TrainState (params +
    AdamW moments) shards over the 8-device data mesh
    (parallel/sharding_rules.fsdp_shardings) and training still completes."""
    import logging

    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=train", "encoder=clip_vit_b_16", "data=msrvtt",
                   "+data.batch_size=1", "+data.num_threads=2",
                   "data.eval_batch_size=4",
                   "trainer.max_epochs=1", "optimizer.lr=1e-4",
                   "++trainer.fsdp=true", "trainer.log_every_n_steps=1",
                   f"+log_dir={tmp_path}/logs",
                   f"trainer.callbacks.checkpoint.dirpath={tmp_path}/ckpt",
                   "trainer.callbacks.checkpoint.every_n_epochs=1"])
    cfg["encoder"] = _tiny_encoder_cfg(vocab_paths)
    with caplog.at_level(logging.INFO, logger="fitclip_tpu.cli.train_runner"):
        run(cfg)
    assert any(rec.getMessage() == "FSDP: TrainState sharded over data=8"
               for rec in caplog.records), "FSDP branch did not engage"
    log_file = tmp_path / "logs" / "metrics.jsonl"
    lines = [json.loads(line) for line in log_file.read_text().splitlines()]
    assert any("loss/train" in line for line in lines)


def test_run_train_resnet_end_to_end(msrvtt_env, vocab_paths, tmp_path):
    """The CLIP-ResNet tower trains through the full CLI path: live
    batch-stats BN in the step, EMA running-stat merge, optimizer-frozen
    running stats (cli/train_runner.py bn_freeze_patterns)."""
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=train", "encoder=clip_rn50", "data=msrvtt",
                   "+data.batch_size=1", "+data.num_threads=2",
                   "data.eval_batch_size=4",
                   "trainer.max_epochs=1", "optimizer.lr=1e-3",
                   "trainer.log_every_n_steps=1",
                   f"+log_dir={tmp_path}/logs",
                   f"trainer.callbacks.checkpoint.dirpath={tmp_path}/ckpt",
                   "trainer.callbacks.checkpoint.every_n_epochs=1"])
    merges, vocab = vocab_paths
    cfg["encoder"] = {
        "_target_": "fitclip_tpu.models.clip.load.load_tiny_rn_test_encoder",
        "bpe_path": merges, "vocab_path": vocab}
    run(cfg)
    assert os.path.isdir(str(tmp_path / "ckpt" / "last"))
    lines = [json.loads(line)
             for line in (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()]
    assert any("loss/train" in line for line in lines)


def test_has_val_propagates_loader_crashes():
    """A crashing val loader must raise, not silently disable validation
    (which would also disable best-checkpointing and early stopping)."""
    from fitclip_tpu.cli.train_runner import _has_val

    class NoVal:
        def val_dataloader(self):
            raise NotImplementedError

    class CrashingVal:
        def val_dataloader(self):
            raise RuntimeError("bad annotation file")

    assert _has_val(NoVal()) is False
    with pytest.raises(RuntimeError, match="bad annotation file"):
        _has_val(CrashingVal())


def test_run_tune_end_to_end(msrvtt_env, vocab_paths, capsys):
    """command=tune: batch-size doubling search + LR range test over the
    jitted train step (reference trainer.tune(), __main__.py:55-63)."""
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=tune", "encoder=clip_vit_b_16", "data=msrvtt",
                   "+data.batch_size=1", "+data.num_threads=2",
                   "+tune.num_lr_steps=30", "+tune.max_trials=3",
                   "+tune.lr_max=0.1"])
    cfg["encoder"] = _tiny_encoder_cfg(vocab_paths)
    run(cfg)
    printed = capsys.readouterr().out
    suggestions = json.loads(printed[printed.index("{"):printed.index("}") + 1])
    # 3 doubling trials from 2 all fit on CPU -> suggestion is the cap 8.
    assert suggestions["batch_size"] == 8
    assert 1e-8 <= suggestions["lr"] <= 0.1


class RecordingSink:
    """Experiment-tracker stand-in for the pluggable trainer.logger slot.
    Records to a file: config-engine instantiation may import this module
    under a second name (tests/ is not a package), so in-memory class state
    is not shared with the test."""

    def __init__(self, tag="sink", out_path="/tmp/sink_records.jsonl"):
        self.tag = tag
        self.out_path = out_path

    def log(self, metrics, step):
        with open(self.out_path, "a") as f:
            f.write(json.dumps({"tag": self.tag, "step": step,
                                "metrics": dict(metrics)}) + "\n")

    def close(self):
        with open(self.out_path, "a") as f:
            f.write(json.dumps({"closed": True}) + "\n")


def test_pluggable_logger_sink(msrvtt_env, vocab_paths, tmp_path):
    out_path = str(tmp_path / "sink_records.jsonl")
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=train", "encoder=clip_vit_b_16", "data=msrvtt",
                   "+data.batch_size=1", "+data.num_threads=1",
                   "data.eval_batch_size=4",
                   "trainer.max_epochs=1", "trainer.log_every_n_steps=1",
                   f"+log_dir={tmp_path}/logs",
                   "++trainer.logger._target_=tests.test_cli.RecordingSink",
                   "++trainer.logger.tag=neptune_like",
                   f"++trainer.logger.out_path={out_path}"])
    cfg["encoder"] = _tiny_encoder_cfg(vocab_paths)
    run(cfg)
    records = [json.loads(line) for line in open(out_path)]
    logged = [r for r in records if "metrics" in r]
    assert logged, "sink saw no metrics"
    assert all(r["tag"] == "neptune_like" for r in logged)
