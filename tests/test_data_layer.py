"""Data layer tests: reader seek math, dataset items, collate, loader.

Uses a deterministic synthetic video (per-frame constant gray levels encoded
losslessly enough to identify frames) written with OpenCV — replacing the
reference's network-fetched test webm.
"""

import numpy as np
import pytest

from fitclip_tpu.data.frame_sampler import UniformFrameSampler
from fitclip_tpu.data.loader import DataLoader
from fitclip_tpu.data.transforms import center_crop, eval_transform, resize_short_side
from fitclip_tpu.data.video_dataset import Collator, FramePipeline, VideoDataset
from fitclip_tpu.data.video_reader import OpenCVVideoReader, VideoReader

NUM_FRAMES = 48
FPS = 12.0


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("videos") / "gradient.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS, (64, 48))
    assert writer.isOpened()
    for i in range(NUM_FRAMES):
        level = int(round(i * 255 / (NUM_FRAMES - 1)))
        writer.write(np.full((48, 64, 3), level, np.uint8))
    writer.release()
    return path


def _frame_levels(frames):
    return frames.mean(axis=(1, 2, 3))


def test_reader_len_fps_and_indexing(video_path):
    reader = OpenCVVideoReader(video_path)
    assert isinstance(VideoReader.from_path(video_path), VideoReader)
    assert len(reader) == NUM_FRAMES
    assert reader.get_avg_fps() == pytest.approx(FPS)

    frames = reader([0, 10, 47])
    assert frames.shape == (3, 48, 64, 3)
    levels = _frame_levels(frames)
    expected = np.array([0, 10, 47]) * 255 / (NUM_FRAMES - 1)
    np.testing.assert_allclose(levels, expected, atol=6)  # MJPEG is lossy


def test_reader_non_monotonic_indices(video_path):
    reader = VideoReader.from_path(video_path)
    frames = reader([20, 5, 20])
    levels = _frame_levels(frames)
    assert abs(levels[0] - levels[2]) < 1
    assert levels[1] < levels[0]


def test_time_to_indices(video_path):
    reader = VideoReader.from_path(video_path)
    # Frame midpoints are (i + 0.5) / fps; time 1.0s -> nearest midpoint is
    # frame 11 (11.5/12 = 0.958) vs frame 12 (12.5/12=1.042): 11 wins ties per
    # the <= rule.
    assert int(reader.time_to_indices(1.0)) in (11, 12)
    assert int(reader.time_to_indices(0.0)) == 0
    assert int(reader.time_to_indices(1000.0)) == NUM_FRAMES - 1


def test_corrupt_video_returns_zeros(tmp_path):
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video")
    reader = VideoReader.from_path(str(bad))
    frames = reader([0, 1, 2])
    assert frames.shape == (3, 256, 256, 3)
    assert frames.sum() == 0


def test_eval_transform_geometry():
    frames = np.random.default_rng(0).integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = eval_transform(frames, 32)
    assert out.shape == (2, 32, 32, 3)
    resized = resize_short_side(frames, 32)
    assert resized.shape == (2, 32, 43, 3)  # short side 48 -> 32, 64*32/48=42.7->43
    assert center_crop(resized, 32).shape == (2, 32, 32, 3)


class _ToyDataset(VideoDataset):
    def __init__(self, path, n=6, **kwargs):
        super().__init__([path] * n, **kwargs)

    def _get_target(self, video_idx):
        return f"caption {video_idx}"


@pytest.fixture()
def toy_dataset(video_path):
    pipeline = FramePipeline(
        sampler=UniformFrameSampler(4),
        transform=lambda frames, rng: eval_transform(frames, 32))
    return _ToyDataset(video_path, pipelines=pipeline)


def test_dataset_item(toy_dataset):
    item = toy_dataset.__getitem__(0, rng=np.random.default_rng(0))
    assert item["video"].shape == (4, 32, 32, 3)
    assert item["video"].dtype == np.uint8
    assert item["target"] == "caption 0"
    assert item["video_id"] == "gradient"


def test_dual_pipeline_keys(video_path):
    pipelines = {
        "student": FramePipeline(UniformFrameSampler(4),
                                 lambda f, rng: eval_transform(f, 32)),
        "teacher": FramePipeline(UniformFrameSampler(2),
                                 lambda f, rng: eval_transform(f, 16)),
    }
    ds = _ToyDataset(video_path, pipelines=pipelines)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["video_student"].shape == (4, 32, 32, 3)
    assert item["video_teacher"].shape == (2, 16, 16, 3)


def test_collator_tokenizer_map():
    def tok_a(texts):
        return np.full((len(texts), 5), 1, np.int32)

    def tok_b(texts):
        return np.full((len(texts), 7), 2, np.int32)

    items = [{"target": "a", "video_student": np.zeros((2, 8, 8, 3), np.uint8),
              "video_id": "x"} for _ in range(3)]
    batch = Collator(tokenizers={"student": tok_a, "teacher": tok_b})(items)
    assert batch["text_student"].shape == (3, 5)
    assert batch["text_teacher"].shape == (3, 7)
    assert batch["video_student"].shape == (3, 2, 8, 8, 3)
    assert batch["video_id"] == ["x", "x", "x"]
    assert "target" not in batch


def test_collator_pads_variable_frames():
    items = [{"target": "a", "video": np.ones((2, 4, 4, 3), np.uint8), "video_id": "x"},
             {"target": "b", "video": np.ones((5, 4, 4, 3), np.uint8), "video_id": "y"}]
    batch = Collator(tokenizers=lambda t: np.zeros((len(t), 3), np.int32))(items)
    assert batch["video"].shape == (2, 5, 4, 4, 3)
    assert batch["video"][0, 2:].sum() == 0  # padded tail


def test_loader_batches_and_determinism(toy_dataset):
    def tok(texts):
        return np.asarray([[len(t)] for t in texts], np.int32)

    loader = DataLoader(toy_dataset, batch_size=4, shuffle=True, seed=7,
                        collate=Collator(tokenizers=tok), num_threads=2)
    first = [b["video_id"] for b in loader]
    second = [b["video_id"] for b in loader]
    assert first == second  # same epoch -> same order
    loader.set_epoch(1)
    third = [b["video_id"] for b in loader]
    assert len(first) == 2  # 6 items, batch 4 -> 2 batches
    batch = next(iter(loader))
    assert batch["video"].shape[0] == 4
    assert batch["text"].shape == (4, 1)
    assert third is not None
