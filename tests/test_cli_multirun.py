"""--multirun through the real main() over two synthetic benchmarks."""

import os
import shutil

import pytest

from fitclip_tpu.cli.main import DEFAULT_CONFIG_DIR, main

from tests.test_cli import msrvtt_env, vocab_paths  # noqa: F401
from tests.test_cli_teacher_student import webvid_env  # noqa: F401


def test_multirun_two_benchmarks(msrvtt_env, webvid_env, vocab_paths,  # noqa: F811
                                 tmp_path, capsys, monkeypatch):
    config_dir = str(tmp_path / "config")
    shutil.copytree(DEFAULT_CONFIG_DIR, config_dir)
    merges, vocab = vocab_paths
    (tmp_path / "config" / "encoder" / "tiny.yaml").write_text(
        "_target_: fitclip_tpu.models.clip.load.load_tiny_test_encoder\n"
        f"bpe_path: {merges}\n"
        f"vocab_path: {vocab}\n")
    monkeypatch.setenv("FITCLIP_CONFIG_DIR", config_dir)

    main(["--multirun", "command=evaluate", "encoder=tiny",
          "data=msrvtt,webvid", "data.eval_batch_size=4", "+data.num_threads=2"])
    printed = capsys.readouterr().out
    # Two metric blocks, one per benchmark.
    assert printed.count('"r1"') == 2
    assert printed.count('"mr"') == 2
