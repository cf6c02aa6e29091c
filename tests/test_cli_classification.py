"""Zero-shot classification through the CLI + checkpoint restore path."""

import json
import os

import numpy as np
import pytest

from fitclip_tpu.cli.main import DEFAULT_CONFIG_DIR, run
from fitclip_tpu.config_engine import compose

from tests.test_datasets import _write_video


@pytest.fixture(scope="module")
def ucf_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ucf")
    categories = ["ApplyEyeMakeup", "Basketball", "YoYo"]
    (root / "classInd.txt").write_text(
        "\n".join(f"{i + 1} {c}" for i, c in enumerate(categories)))
    lines = []
    for category in categories:
        for clip in range(2):
            rel = f"{category}/v_{category}_g0{clip}_c01.avi"
            _write_video(str(root / "videos" / rel))
            lines.append(rel)
    (root / "testlist01.txt").write_text("\n".join(lines))
    os.environ["UCF101_CLASS_IND"] = str(root / "classInd.txt")
    os.environ["UCF101_TEST_LIST"] = str(root / "testlist01.txt")
    os.environ["UCF101_VIDEOS"] = str(root / "videos")
    return str(root)


@pytest.fixture(scope="module")
def tiny_encoder_cfg(tmp_path_factory):
    from fitclip_tpu.models.clip.tokenizer import write_tiny_test_vocab

    directory = tmp_path_factory.mktemp("vocab")
    merges, vocab = write_tiny_test_vocab(
        str(directory), ["a", "photo", "of", "person", "video"] * 3)
    return {"_target_": "fitclip_tpu.models.clip.load.load_tiny_test_encoder",
            "bpe_path": merges, "vocab_path": vocab}


def test_classification_eval_cli(ucf_env, tiny_encoder_cfg, capsys):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", "data=ucf101",
                   "data.eval_batch_size=3", "+data.num_threads=2"])
    cfg["encoder"] = tiny_encoder_cfg
    run(cfg)
    printed = capsys.readouterr().out
    metrics = json.loads(printed[printed.index("{"):])
    assert set(metrics) == {"a1", "a5", "mr"}
    assert 0.0 <= metrics["a1"] <= 1.0
    assert metrics["a5"] == 1.0  # only 3 classes -> top-5 always hits
    assert 1 <= metrics["mr"] <= 3


def test_checkpoint_restore_into_eval(ucf_env, tiny_encoder_cfg, tmp_path, capsys):
    """Train -> orbax checkpoint -> evaluate with checkpoint_path restores the
    trained encoder (the resume/eval-ckpt path, SURVEY §5.4)."""
    import jax

    from fitclip_tpu.config_engine import instantiate
    from fitclip_tpu.training.checkpointing import restore_checkpoint, save_checkpoint

    loaded = instantiate(tiny_encoder_cfg)
    # Fake a "trained" state: perturb params and checkpoint them.
    perturbed = jax.tree_util.tree_map(lambda a: a + 0.01, loaded.params)
    save_checkpoint(str(tmp_path / "ckpt" / "best"),
                    {"params": {"encoder": jax.device_get(perturbed)}})

    restored = restore_checkpoint(str(tmp_path / "ckpt" / "best"))
    leaf_a = jax.tree_util.tree_leaves(restored["params"]["encoder"])[0]
    leaf_b = jax.tree_util.tree_leaves(perturbed)[0]
    np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), atol=1e-6)

    # CLI-level: evaluate with checkpoint_path pointing at the orbax dir.
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", "encoder=clip_vit_b_16", "data=ucf101",
                   "data.eval_batch_size=3", "+data.num_threads=2",
                   f"checkpoint_path={tmp_path}/ckpt/best"])
    cfg["encoder"] = tiny_encoder_cfg
    run(cfg)
    printed = capsys.readouterr().out
    metrics = json.loads(printed[printed.index("{"):])
    assert "a1" in metrics


def test_classification_predict_cli(ucf_env, tiny_encoder_cfg, tmp_path):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=predict", "encoder=clip_vit_b_16", "data=ucf101",
                   "data.eval_batch_size=3", "+data.num_threads=2",
                   f"+output_path={tmp_path}/predictions.pt"])
    cfg["encoder"] = tiny_encoder_cfg
    run(cfg)
    import torch

    predictions = torch.load(str(tmp_path / "predictions.pt"), weights_only=False)
    assert predictions["predictions"].shape == (6,)
    assert predictions["labels"].shape == (6,)
    assert len(predictions["video_ids"]) == 6
    assert set(np.unique(predictions["labels"])) == {0, 1, 2}


@pytest.fixture(scope="module")
def kinetics_env(tmp_path_factory):
    """Kinetics tree with DISTINCT val and test splits (2 vs 4 videos)."""
    import csv

    root = tmp_path_factory.mktemp("kinetics")
    categories = ["abseiling", "baking"]
    (root / "categories.txt").write_text("\n".join(categories))

    def make_split(name, n):
        folder = root / name
        rows = []
        for i in range(n):
            vid = f"{name}vid{i}"
            start, end = 0, 10
            _write_video(str(folder / f"{vid}_{start:06}_{end:06}.mp4"))
            rows.append({"youtube_id": vid, "time_start": start, "time_end": end,
                         "label": categories[i % len(categories)]})
        with open(root / f"{name}.csv", "w", newline="") as file:
            writer = csv.DictWriter(file, fieldnames=list(rows[0]))
            writer.writeheader()
            writer.writerows(rows)

    make_split("val", 2)
    make_split("test", 4)
    os.environ["KINETICS_CATEGORIES"] = str(root / "categories.txt")
    for split in ("train", "val", "test"):
        os.environ[f"KINETICS_{split.upper()}_CSV"] = str(root / f"{split}.csv")
        os.environ[f"KINETICS_{split.upper()}_VIDEOS"] = str(root / split)
    return str(root)


def test_command_test_routes_to_test_split(kinetics_env, tiny_encoder_cfg, caplog):
    """command=test must evaluate the test split when one exists
    (reference __main__.py:64-69), with no val fallback."""
    import logging

    from fitclip_tpu.config_engine import instantiate
    from fitclip_tpu.cli.main import instantiate_data_module

    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=test", "encoder=clip_vit_b_16", "data=kinetics400",
                   "data.eval_batch_size=2", "+data.num_threads=2"])
    encoder_slot = instantiate(tiny_encoder_cfg)
    dm = instantiate_data_module(cfg["data"], encoder_slot)
    val_items = sum(len(b["label"]) for b in dm.val_dataloader())
    test_items = sum(len(b["label"]) for b in dm.test_dataloader())
    assert (val_items, test_items) == (2, 4)  # splits genuinely differ

    with caplog.at_level(logging.WARNING):
        cfg["encoder"] = tiny_encoder_cfg
        run(cfg)
    assert not [r for r in caplog.records if "falling back" in r.message]


def test_command_test_falls_back_to_val_with_warning(ucf_env, tiny_encoder_cfg,
                                                     caplog, capsys):
    """Modules without a test split warn loudly instead of silently
    evaluating val as if it were test."""
    import logging

    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=test", "encoder=clip_vit_b_16", "data=ucf101",
                   "data.eval_batch_size=3", "+data.num_threads=2"])
    cfg["encoder"] = tiny_encoder_cfg
    with caplog.at_level(logging.WARNING):
        run(cfg)
    assert [r for r in caplog.records if "falling back to the val split" in r.message]
    printed = capsys.readouterr().out
    assert "a1" in printed
