"""Native C++ FFmpeg decoder tests (skipped when the .so isn't built)."""

import numpy as np
import pytest

pytest.importorskip("fitclip_tpu.data.native",
                    reason="native decoder not built (make -C native)")

from fitclip_tpu.data.native import NativeVideoReader  # noqa: E402
from fitclip_tpu.data.video_reader import VideoReader  # noqa: E402

from tests.test_data_layer import FPS, NUM_FRAMES, video_path  # noqa: F401,E402


def test_from_path_prefers_native(video_path):
    reader = VideoReader.from_path(video_path)
    assert isinstance(reader, NativeVideoReader)


def test_native_metadata(video_path):
    reader = NativeVideoReader(video_path)
    assert len(reader) == NUM_FRAMES
    assert reader.get_avg_fps() == pytest.approx(FPS, rel=0.01)


def test_native_indexed_decode_matches_opencv(video_path):
    from fitclip_tpu.data.video_reader import OpenCVVideoReader

    native = NativeVideoReader(video_path)
    opencv = OpenCVVideoReader(video_path)
    indices = [0, 7, 23, 7, 47]
    a = native(indices).astype(np.int16)
    b = opencv(indices).astype(np.int16)
    assert a.shape == b.shape == (5, 48, 64, 3)
    assert np.abs(a - b).mean() < 2  # identical MJPEG decode paths, tiny rounding

    # Frame identity: gradient levels increase with index.
    levels = a.mean(axis=(1, 2, 3))
    expected = np.array([0, 7, 23, 7, 47]) * 255 / (NUM_FRAMES - 1)
    np.testing.assert_allclose(levels, expected, atol=6)


def test_native_resize_while_decoding(video_path):
    reader = NativeVideoReader(video_path, resize_hw=(24, 32))
    frames = reader([0, 10])
    assert frames.shape == (2, 24, 32, 3)


def test_native_time_to_indices(video_path):
    reader = NativeVideoReader(video_path)
    assert int(reader.time_to_indices(0.0)) == 0
    assert int(reader.time_to_indices(1.0)) in (11, 12)
    assert int(reader.time_to_indices(1000.0)) == NUM_FRAMES - 1


def test_native_corrupt_file_returns_zeros(tmp_path):
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"garbage")
    reader = NativeVideoReader(str(bad))
    frames = reader([0, 1])
    assert frames.shape == (2, 256, 256, 3)
    assert frames.sum() == 0
