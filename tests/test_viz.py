"""debug_batch / image-grid viz utils (reference util/viz_utils.py:11-37)."""

import numpy as np
import pytest

from fitclip_tpu.utils.viz import debug_batch, denormalize_video, make_image_grid


def test_denormalize_roundtrip():
    mean, std = (0.48, 0.46, 0.41), (0.27, 0.26, 0.28)
    frames = np.random.default_rng(0).integers(0, 256, (2, 3, 8, 8, 3), dtype=np.uint8)
    normalized = (frames.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    restored = denormalize_video(normalized, mean, std)
    np.testing.assert_array_equal(restored, frames)
    # uint8 passes through untouched (folded-normalization pipelines).
    np.testing.assert_array_equal(denormalize_video(frames, mean, std), frames)


def test_make_image_grid_layout():
    images = np.arange(4 * 5 * 6 * 3, dtype=np.uint8).reshape(4, 5, 6, 3)
    grid = make_image_grid(images, num_columns=2, padding=1)
    assert grid.shape == (2 * 6 + 1, 2 * 7 + 1, 3)
    np.testing.assert_array_equal(grid[1:6, 1:7], images[0])
    np.testing.assert_array_equal(grid[7:12, 8:14], images[3])


def test_debug_batch_writes_png_and_decodes_text(tmp_path, capsys):
    from fitclip_tpu.models.clip.load import load_tiny_test_encoder
    from fitclip_tpu.models.clip.tokenizer import write_tiny_test_vocab

    merges, vocab = write_tiny_test_vocab(str(tmp_path), ["a", "cat", "video"] * 3)
    loaded = load_tiny_test_encoder(bpe_path=merges, vocab_path=vocab)
    encoder = loaded.encoder
    video = np.random.default_rng(0).integers(
        0, 256, (2, 2, encoder.preprocess.image_size, encoder.preprocess.image_size, 3),
        dtype=np.uint8)
    text = encoder.get_tokenizer()(["a cat video", "a video"])
    out = str(tmp_path / "grid.png")
    grid = debug_batch(video, text, encoder, output_path=out)
    assert grid.ndim == 3
    import cv2

    written = cv2.imread(out)
    assert written is not None and written.shape == grid.shape
    printed = capsys.readouterr().out
    assert "cat" in printed
