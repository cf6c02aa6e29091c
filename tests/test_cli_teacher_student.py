"""Teacher-student distillation end-to-end through the CLI (the FitCLIP
method, README.md:99-111 command shape) over synthetic WebVid fixtures."""

import json
import os

import pytest

from fitclip_tpu.cli.main import DEFAULT_CONFIG_DIR, run
from fitclip_tpu.config_engine import compose

from tests.test_datasets import _write_video


@pytest.fixture(scope="module")
def webvid_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("webvid")
    for split, count in (("train", 8), ("val", 4)):
        folder = root / split
        for i in range(count):
            _write_video(str(folder / f"vid{split}{i}.mp4"))
        rows = ["videoid,name"] + [f"vid{split}{i},a cat video of {i}" for i in range(count)]
        (root / f"{split}.csv").write_text("\n".join(rows))
    os.environ["WEBVID_TRAIN_CSV"] = str(root / "train.csv")
    os.environ["WEBVID_TRAIN_VIDEOS"] = str(root / "train")
    os.environ["WEBVID_VAL_CSV"] = str(root / "val.csv")
    os.environ["WEBVID_VAL_VIDEOS"] = str(root / "val")
    os.environ["WEBVID_TRAIN_4_5K_CSV"] = str(root / "train.csv")
    return str(root)


@pytest.fixture(scope="module")
def tiny_encoder_cfg(tmp_path_factory):
    from fitclip_tpu.models.clip.tokenizer import write_tiny_test_vocab

    directory = tmp_path_factory.mktemp("vocab")
    merges, vocab = write_tiny_test_vocab(str(directory), ["a", "cat", "video", "of"] * 3)
    return {"_target_": "fitclip_tpu.models.clip.load.load_tiny_test_encoder",
            "bpe_path": merges, "vocab_path": vocab}


def test_teacher_student_train_cli(webvid_env, tiny_encoder_cfg, tmp_path):
    cfg = compose(DEFAULT_CONFIG_DIR, "teacher_student_trainer",
                  ["command=train",
                   "+encoder@encoder.student=clip_vit_b_16",
                   "+encoder@encoder.teacher=clip_vit_b_16",
                   "data=mixed_batch_webvid_4_5k_all",
                   "++model.labeled_dataset_loss_share=0.9999",
                   "data.train_sequence_sizes.labeled=2",
                   "data.train_sequence_sizes.unlabeled=2",
                   "data.data_modules.labeled.batch_size=2",
                   "data.data_modules.unlabeled.batch_size=2",
                   "+data.data_modules.labeled.num_threads=1",
                   "+data.data_modules.unlabeled.num_threads=1",
                   "trainer.max_epochs=1", "trainer.val_check_interval=1.0",
                   "trainer.log_every_n_steps=1",
                   "optimizer.lr=1e-4",
                   f"+log_dir={tmp_path}/logs",
                   f"trainer.callbacks.checkpoint.dirpath={tmp_path}/ckpt",
                   "trainer.callbacks.checkpoint.every_n_epochs=1"])
    cfg["encoder"] = {"student": dict(tiny_encoder_cfg, seed=0),
                      "teacher": dict(tiny_encoder_cfg, seed=1)}
    run(cfg)

    log_file = tmp_path / "logs" / "metrics.jsonl"
    lines = [json.loads(line) for line in log_file.read_text().splitlines()]
    train_lines = [l for l in lines if "loss/train" in l]
    assert train_lines, "no training-step logs"
    assert any("loss/train_labeled" in l for l in train_lines)
    assert any("loss/train_unlabeled" in l for l in train_lines)
    assert os.path.isdir(str(tmp_path / "ckpt" / "last"))
    # Per-dataset retrieval metrics from the mixed group's eval loaders.
    val_lines = [l for l in lines if any(k.startswith("r1_") for k in l)]
    assert any("r1_labeled" in l for l in val_lines)
    assert any("r1_unlabeled" in l for l in val_lines)


def test_wise_encoder_cli(webvid_env, tiny_encoder_cfg, capsys):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", "encoder=wise", "data=webvid",
                   "data.eval_batch_size=4", "+data.num_threads=1",
                   "++encoder.model1={}", "++encoder.model2={}"])
    cfg["encoder"]["model1"] = dict(tiny_encoder_cfg, seed=0)
    cfg["encoder"]["model2"] = dict(tiny_encoder_cfg, seed=1)
    run(cfg)
    printed = capsys.readouterr().out
    metrics = json.loads(printed[printed.index("{"):])
    assert "r1" in metrics
