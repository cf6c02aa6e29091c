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


def test_native_threaded_intra_decode_matches(video_path):
    """decode_threads>1 takes the pipelined intra path (seek to each target
    keyframe, one packet each, parallel frame threads): frames must be
    identical to the serial path."""
    serial = NativeVideoReader(video_path)
    threaded = NativeVideoReader(video_path, decode_threads=4)
    indices = [0, 7, 23, 7, 47]
    np.testing.assert_array_equal(threaded(indices), serial(indices))
    # And again on the same handle (the codec must be reusable post-flush).
    np.testing.assert_array_equal(threaded([3, 40]), serial([3, 40]))


@pytest.fixture(scope="module")
def mp4v_video_path(tmp_path_factory):
    """Inter-frame codec fixture (I+P GOPs) for the seek-policy tests."""
    import cv2

    path = str(tmp_path_factory.mktemp("mp4v") / "clip.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS,
                             (64, 48))
    assert writer.isOpened()
    for i in range(NUM_FRAMES):
        level = int(round(i * 255 / (NUM_FRAMES - 1)))
        writer.write(np.full((48, 64, 3), level, np.uint8))
    writer.release()
    return path


def test_native_inter_codec_seek_policy(mp4v_video_path):
    """The keyframe-aware seek policy must still produce the right frames on
    an inter codec (decode resumes from the preceding keyframe, catching up
    through the P-chain)."""
    reader = NativeVideoReader(mp4v_video_path)
    assert len(reader) == NUM_FRAMES
    indices = [2, 17, 33, 46]
    frames = reader(indices).astype(np.float32)
    levels = frames.mean(axis=(1, 2, 3))
    expected = np.array(indices) * 255 / (NUM_FRAMES - 1)
    # mp4v is lossy; the gradient level identifies the frame well within 10.
    np.testing.assert_allclose(levels, expected, atol=10)
    # Backwards + repeated reads on the same handle.
    again = reader([46, 2, 2]).astype(np.float32).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(
        again, np.array([46, 2, 2]) * 255 / (NUM_FRAMES - 1), atol=10)
