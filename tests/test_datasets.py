"""Dataset + data-module end-to-end tests over synthetic on-disk fixtures."""

import json
import os

import numpy as np
import pytest

from fitclip_tpu.data.data_module_group import (EvalDataModuleGroup,
                                                MixedBatchDataModule)
from fitclip_tpu.data.datasets.msrvtt import MsrVttDataModule
from fitclip_tpu.data.datasets.ucf import UcfDataModule, folder_name_to_category
from fitclip_tpu.data.datasets.webvid import WebVidDataModule
from fitclip_tpu.models.clip import CLIPConfig
from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
from fitclip_tpu.models.clip.tokenizer import ClipTokenizer, write_tiny_test_vocab


def _write_video(path, num_frames=12, size=(48, 40)):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    fourcc = "mp4v" if str(path).endswith(".mp4") else "MJPG"
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*fourcc), 8.0, size)
    assert writer.isOpened()
    for i in range(num_frames):
        writer.write(np.full((size[1], size[0], 3), (i * 20) % 255, np.uint8))
    writer.release()


@pytest.fixture(scope="module")
def encoder(tmp_path_factory):
    directory = tmp_path_factory.mktemp("vocab")
    merges, vocab = write_tiny_test_vocab(str(directory),
                                          ["a", "cat", "video", "of", "person"] * 3)
    tokenizer = ClipTokenizer(bpe_path=merges, vocab_path=vocab, context_length=16)
    return ClipVideoTextEncoder(CLIPConfig.tiny_test(vocab_size=tokenizer.vocab_size),
                                num_frames=4, tokenizer=tokenizer)


@pytest.fixture(scope="module")
def msrvtt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    videos = root / "videos" / "all"
    for i in range(4):
        _write_video(videos / f"video{i}.avi")
    (root / "structured-symlinks").mkdir()
    (root / "structured-symlinks" / "val_list_jsfusion.txt").write_text(
        "video0\nvideo1\nvideo2\n")
    (root / "structured-symlinks" / "train_list_jsfusion.txt").write_text("video3\n")
    (root / "annotation").mkdir()
    annotations = [{"image_id": f"video{i}", "caption": f"a cat video {i}"}
                   for i in range(4)]
    annotations.append({"image_id": "video0", "caption": "a second caption"})
    (root / "annotation" / "MSR_VTT.json").write_text(
        json.dumps({"annotations": annotations}))
    return str(root)


def test_msrvtt_eval_loader(encoder, msrvtt_root):
    dm = MsrVttDataModule(base_path=msrvtt_root, encoder=encoder, eval_batch_size=2,
                          num_threads=2)
    loader = dm.val_dataloader()
    batches = list(loader)
    assert len(batches) == 2  # 3 videos, batch 2
    first = batches[0]
    assert first["video"].shape == (2, 4, 32, 32, 3)
    assert first["video"].dtype == np.uint8
    assert first["text"].shape == (2, 16)
    assert first["video_id"] == ["video0", "video1"]
    # "first" caption strategy: video0 gets its first annotation
    decoded = list(encoder.decode_text(first["text"]))
    assert "cat" in decoded[0]


@pytest.fixture(scope="module")
def webvid_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("webvid")
    for split in ("train", "val"):
        folder = root / split
        for i in range(6 if split == "train" else 3):
            _write_video(folder / f"vid{split}{i}.avi")
        rows = ["videoid,name"] + [f"vid{split}{i},a video of {i}" for i in range(8)]
        (root / f"{split}.csv").write_text("\n".join(rows))
    return str(root)


def _webvid_dm(encoder, root, **kwargs):
    return WebVidDataModule(
        train_video_info_file_path=os.path.join(root, "train.csv"),
        train_videos_folder=os.path.join(root, "train"),
        val_video_info_file_path=os.path.join(root, "val.csv"),
        val_videos_folder=os.path.join(root, "val"),
        encoder=encoder, **kwargs)


def test_webvid_train_loader_shuffles_and_crops(encoder, webvid_root):
    dm = _webvid_dm(encoder, webvid_root, batch_size=2, num_threads=2)
    loader = dm.train_dataloader()
    batch = next(iter(loader))
    assert batch["video"].shape == (2, 4, 32, 32, 3)
    assert batch["text"].shape == (2, 16)


def test_ucf_classification_module(encoder, tmp_path_factory):
    root = tmp_path_factory.mktemp("ucf")
    categories = ["ApplyEyeMakeup", "Basketball"]
    (root / "classInd.txt").write_text(
        "\n".join(f"{i + 1} {c}" for i, c in enumerate(categories)))
    lines = []
    for category in categories:
        rel = f"{category}/v_{category}_g01_c01.avi"
        _write_video(root / "videos" / rel)
        lines.append(rel)
    (root / "testlist01.txt").write_text("\n".join(lines))

    dm = UcfDataModule(categories_file_path=str(root / "classInd.txt"),
                       val_file_list_path=str(root / "testlist01.txt"),
                       val_videos_folder=str(root / "videos"),
                       encoder=encoder, eval_batch_size=2, num_threads=1)
    assert dm.categories == {"Apply Eye Makeup": 0, "Basketball": 1}
    assert len(dm.templates) == 48
    batch = next(iter(dm.val_dataloader()))
    assert batch["label"].tolist() == [0, 1]
    assert batch["category"] == ["Apply Eye Makeup", "Basketball"]
    assert batch["video"].shape == (2, 4, 32, 32, 3)


def test_folder_name_to_category():
    assert folder_name_to_category("ApplyEyeMakeup") == "Apply Eye Makeup"
    assert folder_name_to_category("YoYo") == "Yo Yo"


def test_mixed_batch_module(encoder, webvid_root):
    encoder_map = {"student": encoder, "teacher": encoder}
    labeled = _webvid_dm(encoder_map, webvid_root, batch_size=8, num_threads=1)
    unlabeled = _webvid_dm(encoder_map, webvid_root, batch_size=8, num_threads=1)
    group = MixedBatchDataModule({"labeled": labeled, "unlabeled": unlabeled},
                                 train_sequence_sizes={"labeled": 2, "unlabeled": 2})
    loader = group.train_dataloader()
    batches = list(loader)
    assert len(batches) == len(loader) == 3  # 6 train videos / run size 2
    batch = batches[0]
    for name in ("labeled", "unlabeled"):
        sub = batch[name]
        assert sub["video_student"].shape == (2, 4, 32, 32, 3)
        assert sub["video_teacher"].shape == (2, 4, 32, 32, 3)
        assert sub["text_student"].shape == (2, 16)
        assert sub["text_teacher"].shape == (2, 16)

    # Eval side: separate loaders per module.
    val_loaders = group.val_dataloader()
    assert len(val_loaders) == 2

    # Epoch reshuffle changes composition.
    ids_epoch0 = [b["labeled"]["video_id"] for b in loader]
    loader.set_epoch(1)
    ids_epoch1 = [b["labeled"]["video_id"] for b in loader]
    assert ids_epoch0 != ids_epoch1


def test_eval_group(encoder, webvid_root):
    group = EvalDataModuleGroup({"a": _webvid_dm(encoder, webvid_root, num_threads=1),
                                 "b": _webvid_dm(encoder, webvid_root, num_threads=1)})
    assert group.names == ["a", "b"]
    assert len(group.val_dataloader()) == 2
