"""Host-decode fast paths: decode-time downscale + the eval frame cache.

SURVEY §7 hard-part #1 / VERDICT r2 weak #7: decoding full-res then resizing
to eval geometry wastes most of the per-clip host cost. The native decoder
swscales to the target short side DURING decode; the opt-in frame cache makes
repeated eval sweeps skip decode entirely.
"""

import os

import numpy as np
import pytest

from fitclip_tpu.data.video_reader import OpenCVVideoReader, VideoReader, scaled_size

from tests.test_datasets import _write_video


def test_scaled_size_math():
    assert scaled_size(480, 640, 256) == (256, 341)
    assert scaled_size(640, 480, 256) == (341, 256)
    assert scaled_size(200, 300, 256) == (200, 300)  # never upscales
    assert scaled_size(256, 512, 256) == (256, 512)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clips") / "clip.avi")
    _write_video(path, num_frames=10, size=(64, 48))  # (w, h) -> 48x64 frames
    return path


def test_opencv_reader_short_side(video_path):
    full = OpenCVVideoReader(video_path)([0, 3])
    small = OpenCVVideoReader(video_path, short_side=24)([0, 3])
    assert full.shape[1:] == (48, 64, 3)
    assert small.shape[1:] == (24, 32, 3)
    import cv2

    resized = np.stack([cv2.resize(f, (32, 24), interpolation=cv2.INTER_CUBIC)
                        for f in full])
    assert np.abs(resized.astype(np.int16) - small.astype(np.int16)).mean() < 2


def test_native_reader_short_side(video_path):
    native = pytest.importorskip("fitclip_tpu.data.native",
                                 reason="native decoder not built")
    full = native.NativeVideoReader(video_path)([0, 3])
    small = native.NativeVideoReader(video_path, short_side=24)([0, 3])
    assert full.shape[1:] == (48, 64, 3)
    assert small.shape[1:] == (24, 32, 3)
    import cv2

    resized = np.stack([cv2.resize(f, (32, 24), interpolation=cv2.INTER_CUBIC)
                        for f in full])
    # swscale bicubic vs cv2 bicubic: same image, last-bits differ.
    assert np.abs(resized.astype(np.int16) - small.astype(np.int16)).mean() < 4


def test_from_path_passes_short_side(video_path):
    frames = VideoReader.from_path(video_path, short_side=24)([0])
    assert frames.shape[1:] == (24, 32, 3)


def test_eval_frame_cache_skips_decode(tmp_path, monkeypatch):
    from fitclip_tpu.data.frame_sampler import UniformFrameSampler
    from fitclip_tpu.data.video_dataset import FramePipeline, VideoDataset

    path = str(tmp_path / "v.avi")
    _write_video(path, num_frames=8, size=(32, 32))

    class Dataset(VideoDataset):
        def _get_target(self, video_idx):
            return "t"

    def make():
        return Dataset(
            video_paths=[path],
            pipelines=FramePipeline(sampler=UniformFrameSampler(2),
                                    transform=lambda frames, rng: frames),
            frame_cache_dir=str(tmp_path / "cache"))

    first = make()[0]
    assert os.listdir(str(tmp_path / "cache"))

    # Second pass must not even OPEN the video.
    def boom(*args, **kwargs):
        raise AssertionError("decode happened despite a warm cache")

    monkeypatch.setattr(VideoReader, "from_path", staticmethod(boom))
    second = make()[0]
    np.testing.assert_array_equal(first["video"], second["video"])


def test_frame_cache_distinguishes_segments(tmp_path):
    """Segment datasets repeat one video FILE across rows with different clip
    times (YouCook2-style); each row must get its own cache entry."""
    from fitclip_tpu.data.frame_sampler import UniformFrameSampler
    from fitclip_tpu.data.video_dataset import FramePipeline, VideoDataset

    path = str(tmp_path / "v.avi")
    _write_video(path, num_frames=12, size=(32, 32))

    class SegmentDataset(VideoDataset):
        def __init__(self, **kwargs):
            super().__init__(video_paths=[path, path], **kwargs)

        def _get_target(self, video_idx):
            return "t"

        def _get_times(self, video_idx):
            return (0.0, 0.4) if video_idx == 0 else (0.9, 1.4)

    dataset = SegmentDataset(
        pipelines=FramePipeline(sampler=UniformFrameSampler(2),
                                transform=lambda frames, rng: frames),
        frame_cache_dir=str(tmp_path / "cache"))
    first, second = dataset[0], dataset[1]
    assert len(os.listdir(str(tmp_path / "cache"))) == 2
    assert not np.array_equal(first["video"], second["video"])
    # Warm-cache reads return each segment's own frames.
    np.testing.assert_array_equal(dataset[0]["video"], first["video"])
    np.testing.assert_array_equal(dataset[1]["video"], second["video"])
