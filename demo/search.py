"""Subtitle search over ASR caption JSONs (stdlib re-implementation).

The reference demo (demo/search.py) loads Google STT caption JSONs — word
tokens with start/end times — and matches spaCy token patterns. This version
keeps the same caption format and the token-pattern search surface
(sequences of specs like {"LOWER": "cat"} / {} wildcards, with "IN" lists and
"OP": "?"/"*"/"+") without the spaCy dependency: tokens are whitespace words
and matching runs over lowercase forms.
"""

import json
import os
import re
from typing import Any, Dict, Iterator, List, Mapping, Optional, Sequence

RE_MULTIPLE_SPACES = re.compile(r" {2,}")


def list_caption_paths(dir_path: str) -> Iterator[str]:
    with os.scandir(dir_path) as entries:
        for entry in entries:
            if entry.is_file() and entry.name.endswith(".json"):
                yield entry.path


def _parse_caption_time(value: str) -> float:
    return float(value[:-1]) if isinstance(value, str) and value.endswith("s") \
        else float(value)


def load_caption(path: str) -> Optional[Dict[str, Any]]:
    """Google STT JSON -> {"video_id", "text", "tokens_info"} (same shape the
    reference keeps, demo/search.py:41-60)."""
    with open(path) as file:
        caption = json.load(file)
    results = caption.get("results") or []
    if not results:
        return None
    tokens_info = results[-1]["alternatives"][0].get("words")
    if not tokens_info:
        return None
    text = RE_MULTIPLE_SPACES.sub(
        " ", " ".join(r["alternatives"][0]["transcript"].strip()
                      for r in results[:-1])).strip()
    return {
        "video_id": os.path.basename(path).rsplit(".", maxsplit=1)[0],
        "text": text,
        "tokens_info": [{
            "word": info["word"],
            "start_time": _parse_caption_time(info["startTime"]),
            "end_time": _parse_caption_time(info["endTime"]),
        } for info in tokens_info],
    }


def load_captions(dir_path: str) -> List[Dict[str, Any]]:
    captions = []
    for path in sorted(list_caption_paths(dir_path)):
        caption = load_caption(path)
        if caption:
            captions.append(caption)
    return captions


def _token_matches(spec: Mapping[str, Any], word: str) -> bool:
    if not spec:
        return True  # wildcard {}
    lower = word.lower()
    for key, expected in spec.items():
        if key == "OP":
            continue
        if key not in ("LOWER", "ORTH", "TEXT"):
            raise ValueError(f"Unsupported token attribute: {key}")
        value = lower if key == "LOWER" else word
        if isinstance(expected, Mapping):
            options = expected.get("IN")
            if options is None or value not in options:
                return False
        elif value != expected:
            return False
    return True


def _match_from(pattern: Sequence[Mapping[str, Any]], words: Sequence[str],
                start: int) -> Optional[int]:
    """Greedy matcher with OP ? / * / + support; returns end index or None."""
    position = start

    def match_piece(piece_index: int, position: int) -> Optional[int]:
        if piece_index == len(pattern):
            return position
        spec = pattern[piece_index]
        op = spec.get("OP", "1")
        if op == "1":
            if position < len(words) and _token_matches(spec, words[position]):
                return match_piece(piece_index + 1, position + 1)
            return None
        if op == "?":
            if position < len(words) and _token_matches(spec, words[position]):
                result = match_piece(piece_index + 1, position + 1)
                if result is not None:
                    return result
            return match_piece(piece_index + 1, position)
        if op in ("*", "+"):
            minimum = 1 if op == "+" else 0
            count = 0
            while position + count < len(words) and _token_matches(spec, words[position + count]):
                count += 1
            for take in range(count, minimum - 1, -1):
                result = match_piece(piece_index + 1, position + take)
                if result is not None:
                    return result
            return None
        raise ValueError(f"Unsupported OP: {op}")

    return match_piece(0, position)


def search_in_subtitles(captions: Sequence[Mapping[str, Any]],
                        pattern: Sequence[Mapping[str, Any]]) -> Iterator[Dict[str, Any]]:
    """Yields {"video_id", "start_time", "end_time", "text"} spans."""
    for caption in captions:
        words = [t["word"] for t in caption["tokens_info"]]
        for start in range(len(words)):
            end = _match_from(pattern, words, start)
            if end is not None and end > start:
                tokens = caption["tokens_info"][start:end]
                yield {
                    "video_id": caption["video_id"],
                    "start_time": tokens[0]["start_time"],
                    "end_time": tokens[-1]["end_time"],
                    "text": " ".join(t["word"] for t in tokens),
                }
