"""The analysis notebook's pipeline, headless, on synthetic media.

Covers the capabilities of the reference notebook
(/root/reference/notebooks/clip_subtitle_viz.ipynb): video -> per-frame CLIP
embeddings, frame-vs-text score curves under several scoring modes, caption
span mining (sents / noun chunks / verb phrases / imperative orders), and the
batch PDF export — plus a sync check that the committed .ipynb is exactly the
render of its percent-format .py source.
"""

import json
import os

import numpy as np
import pytest

from notebooks.clip_subtitle_viz import (create_figure_for_text,
                                         encode_visual, frame_text_scores,
                                         get_noun_chunks, get_orders,
                                         get_sents, get_verb_phrases,
                                         get_video_info,
                                         show_caption_figures_and_pdf)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("viz") / "clip01.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 8.0,
                             (48, 40))
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    for index in range(32):
        frame = np.full((40, 48, 3), 8 * index, np.uint8)
        frame += rng.integers(0, 16, frame.shape, np.uint8)
        writer.write(frame)
    writer.release()
    return path


@pytest.fixture(scope="module")
def caption(tmp_path_factory):
    from demo.search import load_caption

    words = ("put it on the mat the red cat sits on the mat is it good"
             .split())
    times = [(0.25 * i, 0.25 * i + 0.2) for i in range(len(words))]
    payload = {"results": [
        {"alternatives": [{"transcript":
                           "Put it on the mat. The red cat sits on the mat."
                           " Is it good?"}]},
        {"alternatives": [{"words": [
            {"word": w, "startTime": f"{s}s", "endTime": f"{e}s"}
            for w, (s, e) in zip(words, times)]}]},
    ]}
    path = tmp_path_factory.mktemp("captions") / "clip01.json"
    path.write_text(json.dumps(payload))
    return load_caption(str(path))


def test_get_video_info(video_path):
    info = get_video_info(video_path, frame_stride=4,
                          thumbnail_interval_s=1.0, thumbnail_size=16)
    assert info["video_id"] == "clip01"
    assert len(info["frames"]) == 8
    assert info["frames"][0].shape == (40, 48, 3)
    assert np.all(np.diff(info["frame_times"]) > 0)
    assert len(info["thumbnails"]) == len(info["thumbnail_times"])
    assert max(info["thumbnails"][0].shape[:2]) <= 16


def test_sents_keep_punctuation_and_times(caption):
    sents = list(get_sents(caption))
    assert [s["text"] for s in sents] == [
        "Put it on the mat.", "The red cat sits on the mat.", "Is it good?"]
    assert sents[0]["start_time"] == 0.0
    assert sents[1]["start_time"] == pytest.approx(1.25)
    assert sents[-1]["end_time"] == pytest.approx(0.25 * 14 + 0.2)


def test_noun_chunks(caption):
    chunks = [c["text"] for c in get_noun_chunks(caption)]
    assert "A photo of the red cat." in chunks
    assert all(c.startswith("A photo of ") for c in chunks)


def test_verb_phrases(caption):
    phrases = [p["text"] for p in get_verb_phrases(caption)]
    assert any(p.startswith("put it on the mat") for p in phrases)
    assert any(p.startswith("sits") for p in phrases)


def test_orders_imperative_only(caption):
    orders = [o["text"] for o in get_orders(caption)]
    assert orders == ["Put it on the mat."]  # declarative + question excluded


def test_score_modes():
    frames = np.eye(3, 4, dtype=np.float32)
    text = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    softmax = frame_text_scores(frames, text, mode="softmax", temperature=10)
    assert softmax.sum() == pytest.approx(1.0)
    assert softmax.argmax() == 0
    dots = frame_text_scores(frames, text, mode="dot")
    assert dots[0] == pytest.approx(1.0) and dots[1] == pytest.approx(0.0)
    exp = frame_text_scores(frames, text, mode="exp")
    assert exp.max() == pytest.approx(1.0)  # max-shifted, unnormalized


def test_pipeline_pdf_export(video_path, caption, tmp_path):
    from fitclip_tpu.models.clip.load import load_tiny_test_encoder
    from fitclip_tpu.models.clip.tokenizer import write_tiny_test_vocab

    merges, vocab = write_tiny_test_vocab(
        str(tmp_path), "a photo of the red cat sits on mat put it is good".split())
    encoder = load_tiny_test_encoder(bpe_path=merges, vocab_path=vocab)
    info = get_video_info(video_path, frame_stride=8,
                          thumbnail_interval_s=2.0, thumbnail_size=16)
    encoded = encode_visual(info["frames"], encoder, batch_size=2)
    assert encoded.shape == (len(info["frames"]),
                             encoder.encoder.config.embed_dim)
    assert np.allclose(np.linalg.norm(encoded, axis=-1), 1.0, atol=1e-3)

    figure = create_figure_for_text(encoded, "a red cat", encoder,
                                    info["frame_times"],
                                    info["thumbnail_times"],
                                    info["thumbnails"])
    assert figure.axes[0].get_title() == "a red cat"

    pdf = show_caption_figures_and_pdf(
        info["video_id"], caption, encoded, encoder, info["frame_times"],
        info["thumbnail_times"], info["thumbnails"], text_mode="sents",
        output_dir=str(tmp_path))
    assert os.path.getsize(pdf) > 1000


def test_committed_ipynb_in_sync():
    import importlib

    renderer = importlib.import_module("scripts.py_to_ipynb") \
        if os.path.exists(os.path.join(REPO_ROOT, "scripts", "__init__.py")) \
        else None
    if renderer is None:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "py_to_ipynb", os.path.join(REPO_ROOT, "scripts", "py_to_ipynb.py"))
        renderer = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(renderer)

    py_path = os.path.join(REPO_ROOT, "notebooks", "clip_subtitle_viz.py")
    ipynb_path = os.path.join(REPO_ROOT, "notebooks", "clip_subtitle_viz.ipynb")
    with open(ipynb_path) as file:
        committed = json.load(file)
    assert renderer.render_notebook(py_path) == committed
