"""Full mid-training resume through the CLI.

Reference behavior: ``trainer.fit(ckpt_path=...)`` restores params, optimizer
state, and step so an interrupted run continues exactly
(aligner/cli.py:148, aligner/__main__.py:51). Here: train N steps, stop,
``command=train checkpoint_path=<orbax last>`` — the composed stream must be
bit-identical to training straight through, including a MID-epoch stop (the
trainer fast-forwards the partially covered epoch's loader).
"""

import os

import jax
import numpy as np
import pytest

from fitclip_tpu.cli.main import DEFAULT_CONFIG_DIR, run
from fitclip_tpu.config_engine import compose
from fitclip_tpu.training.checkpointing import (is_full_train_state,
                                                restore_checkpoint)

from tests.test_datasets import _write_video


@pytest.fixture(scope="module")
def webvid_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("webvid_resume")
    for split, count in (("train", 8), ("val", 3)):
        folder = root / split
        for i in range(count):
            _write_video(str(folder / f"vid{split}{i}.mp4"))
        rows = ["videoid,name"] + [f"vid{split}{i},a cat video of {i}"
                                   for i in range(count)]
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
    merges, vocab = write_tiny_test_vocab(str(directory),
                                          ["a", "cat", "video", "of"] * 3)
    return {"_target_": "fitclip_tpu.models.clip.load.load_tiny_test_encoder",
            "bpe_path": merges, "vocab_path": vocab}


def _train_cfg(tiny_encoder_cfg, workdir, extra):
    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=train", "encoder=clip_vit_b_16", "data=webvid",
                   "+data.batch_size=2", "+data.num_threads=1",
                   "data.eval_batch_size=4",
                   "trainer.max_epochs=2", "optimizer.lr=1e-3",
                   "trainer.val_check_interval=1.0",
                   f"+log_dir={workdir}/logs",
                   f"trainer.callbacks.checkpoint.dirpath={workdir}/ckpt",
                   "trainer.callbacks.checkpoint.every_n_epochs=0"] + extra)
    cfg["encoder"] = dict(tiny_encoder_cfg, seed=0)
    return cfg


def _leaves(params):
    return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(params)]


def test_resume_is_bit_identical_to_straight_run(webvid_env, tiny_encoder_cfg,
                                                 tmp_path):
    # Straight run: 8 steps (2 epochs x 4 batches of 2 over 8 videos).
    run(_train_cfg(tiny_encoder_cfg, tmp_path / "straight", []))
    straight = restore_checkpoint(str(tmp_path / "straight" / "ckpt" / "last"))
    assert int(np.asarray(straight["step"])) == 8

    # Interrupted run: stop MID-epoch at step 3, then resume to 8.
    run(_train_cfg(tiny_encoder_cfg, tmp_path / "resumed",
                   ["+trainer.max_steps=3"]))
    last = str(tmp_path / "resumed" / "ckpt" / "last")
    assert is_full_train_state(last)
    partial = restore_checkpoint(last)
    assert int(np.asarray(partial["step"])) == 3

    run(_train_cfg(tiny_encoder_cfg, tmp_path / "resumed",
                   ["+trainer.max_steps=8", f"+checkpoint_path={last}"]))
    resumed = restore_checkpoint(last)
    assert int(np.asarray(resumed["step"])) == 8

    for got, want in zip(_leaves(resumed["params"]), _leaves(straight["params"])):
        np.testing.assert_array_equal(got, want)
    for got, want in zip(_leaves(resumed["opt_state"]),
                         _leaves(straight["opt_state"])):
        np.testing.assert_array_equal(got, want)


def test_teacher_student_resume(webvid_env, tiny_encoder_cfg, tmp_path):
    """A {student, teacher} slot resumes the full TrainState too (cli.py used
    to skip checkpoint_path entirely for mapping slots)."""

    def ts_cfg(extra):
        cfg = compose(DEFAULT_CONFIG_DIR, "teacher_student_trainer",
                      ["command=train",
                       "+encoder@encoder.student=clip_vit_b_16",
                       "+encoder@encoder.teacher=clip_vit_b_16",
                       "data=mixed_batch_webvid_4_5k_all",
                       "data.train_sequence_sizes.labeled=2",
                       "data.train_sequence_sizes.unlabeled=2",
                       "data.data_modules.labeled.batch_size=2",
                       "data.data_modules.unlabeled.batch_size=2",
                       "+data.data_modules.labeled.num_threads=1",
                       "+data.data_modules.unlabeled.num_threads=1",
                       "trainer.max_epochs=1", "optimizer.lr=1e-3",
                       f"+log_dir={tmp_path}/ts/logs",
                       f"trainer.callbacks.checkpoint.dirpath={tmp_path}/ts/ckpt",
                       "trainer.callbacks.checkpoint.every_n_epochs=0"] + extra)
        cfg["encoder"] = {"student": dict(tiny_encoder_cfg, seed=0),
                          "teacher": dict(tiny_encoder_cfg, seed=1)}
        return cfg

    run(ts_cfg(["+trainer.max_steps=2"]))
    last = str(tmp_path / "ts" / "ckpt" / "last")
    partial = restore_checkpoint(last)
    assert int(np.asarray(partial["step"])) == 2
    assert "ts_logit_scale" in partial["params"]

    run(ts_cfg(["+trainer.max_steps=4", f"+checkpoint_path={last}"]))
    resumed = restore_checkpoint(last)
    assert int(np.asarray(resumed["step"])) == 4
