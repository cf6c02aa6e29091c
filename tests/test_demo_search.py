"""Subtitle-search demo tests over a synthetic Google-STT-format caption."""

import json

import pytest

from demo.search import load_caption, load_captions, search_in_subtitles


@pytest.fixture()
def captions(tmp_path):
    words = [("the", 0.0, 0.2), ("cat", 0.2, 0.5), ("sits", 0.5, 0.9),
             ("on", 0.9, 1.0), ("the", 1.0, 1.1), ("mat", 1.1, 1.5)]
    payload = {
        "results": [
            {"alternatives": [{"transcript": "the cat sits on the mat"}]},
            {"alternatives": [{"words": [
                {"word": w, "startTime": f"{s}s", "endTime": f"{e}s"}
                for w, s, e in words]}]},
        ],
    }
    (tmp_path / "video123.json").write_text(json.dumps(payload))
    (tmp_path / "empty.json").write_text(json.dumps({"results": []}))
    return load_captions(str(tmp_path))


def test_load_caption_shape(captions):
    assert len(captions) == 1
    caption = captions[0]
    assert caption["video_id"] == "video123"
    assert caption["text"] == "the cat sits on the mat"
    assert caption["tokens_info"][1]["start_time"] == 0.2


def test_exact_token_pattern(captions):
    results = list(search_in_subtitles(captions, [{"LOWER": "cat"}, {"LOWER": "sits"}]))
    assert len(results) == 1
    assert results[0]["text"] == "cat sits"
    assert results[0]["start_time"] == 0.2
    assert results[0]["end_time"] == 0.9


def test_wildcard_and_in(captions):
    results = list(search_in_subtitles(
        captions, [{"LOWER": "the"}, {}, {"LOWER": {"IN": ["sits", "runs"]}}]))
    assert len(results) == 1
    assert results[0]["text"] == "the cat sits"


def test_op_star(captions):
    results = list(search_in_subtitles(
        captions, [{"LOWER": "cat"}, {"OP": "*"}, {"LOWER": "mat"}]))
    assert any(r["text"] == "cat sits on the mat" for r in results)
