"""Subtitle search over ASR caption JSONs (stdlib re-implementation).

The reference demo (demo/search.py) loads Google STT caption JSONs — word
tokens with start/end times — and matches spaCy token patterns. This version
keeps the same caption format and the token-pattern search surface
(sequences of specs like {"LOWER": "cat"} / {} wildcards, with "IN" lists and
"OP": "?"/"*"/"+") without the spaCy dependency: tokens are whitespace words
and matching runs over lowercase forms.

POS-lite: specs may also use {"POS": ...} with the universal coarse tags
(DET/ADP/PRON/AUX/CCONJ/SCONJ/PART/NUM/ADV/VERB/ADJ/NOUN/PROPN/INTJ/PUNCT).
Tagging is lexicon + suffix heuristics and AMBIGUITY-TOLERANT: a word matches
a requested POS when that tag is plausible for it ("run" matches both VERB
and NOUN), which approximates the reference's transformer tagger without the
undownloadable model.

DEP-lite: specs may use {"DEP": ...} with a heuristic subset of spaCy's
English labels, derived from the POS-lite tags by local word order (no
parser): nominals before a nearby verb are "nsubj" candidates, nominals
after a verb are "dobj"/"obj"/"iobj" candidates, nominals after a
preposition are "pobj", determiners "det", adjectives before a nominal
"amod", prepositions "prep", verbs "ROOT". Like POS-lite it is
AMBIGUITY-TOLERANT — a word matches a requested label when that label is
plausible — which makes the reference demo's own example query
(reference demo/app.py:20, [{"LOWER": "this", "DEP": {"IN": ["nsubj",
"dobj", "iobj"]}}]) runnable without the spaCy transformer parser. Labels
outside the heuristic set raise (documented unsupported).
"""

import json
import os
import re
from typing import Any, Dict, Iterator, List, Mapping, Optional, Sequence, Set

RE_MULTIPLE_SPACES = re.compile(r" {2,}")

_CLOSED_CLASS = {
    "DET": {"a", "an", "the", "this", "that", "these", "those", "some", "any",
            "no", "every", "each", "either", "neither", "both", "all"},
    "ADP": {"in", "on", "at", "by", "for", "with", "about", "against",
            "between", "into", "through", "during", "before", "after",
            "above", "below", "to", "from", "up", "down", "of", "off", "over",
            "under", "near", "without", "within", "along", "across", "behind",
            "beyond", "around", "toward", "towards", "upon", "onto"},
    "PRON": {"i", "me", "my", "mine", "myself", "you", "your", "yours",
             "yourself", "he", "him", "his", "himself", "she", "her", "hers",
             "herself", "it", "its", "itself", "we", "us", "our", "ours",
             "ourselves", "they", "them", "their", "theirs", "themselves",
             "who", "whom", "whose", "which", "what", "something", "anything",
             "nothing", "everything", "someone", "anyone", "everyone"},
    "AUX": {"am", "is", "are", "was", "were", "be", "been", "being", "do",
            "does", "did", "have", "has", "had", "will", "would", "shall",
            "should", "can", "could", "may", "might", "must"},
    "CCONJ": {"and", "or", "but", "nor", "yet", "so"},
    "SCONJ": {"if", "because", "while", "although", "though", "since",
              "unless", "whereas", "whether", "when", "where", "that"},
    "PART": {"not", "n't", "'s", "to"},
    "INTJ": {"oh", "wow", "hey", "hello", "hi", "yeah", "yes", "no", "okay",
             "ok", "hmm", "uh", "um"},
}

_ADJ_SUFFIXES = ("ous", "ful", "ive", "able", "ible", "al", "ish", "less",
                 "ic", "est", "er", "y")
_VERB_SUFFIXES = ("ing", "ed", "ize", "ise", "ify", "ate", "en", "s")
_NOUN_SUFFIXES = ("tion", "sion", "ment", "ness", "ity", "ship", "hood",
                  "ism", "ist", "ers", "ing", "s")
# Frequent base-form verbs the suffix rules can't see (they also stay NOUN
# candidates — ambiguity-tolerant).
_COMMON_VERBS = {
    "go", "get", "make", "know", "think", "take", "see", "come", "want",
    "look", "use", "find", "give", "tell", "work", "call", "try", "ask",
    "need", "feel", "become", "leave", "put", "mean", "keep", "let", "begin",
    "seem", "help", "talk", "turn", "start", "show", "hear", "play", "run",
    "move", "like", "live", "believe", "hold", "bring", "happen", "write",
    "sit", "stand", "lose", "pay", "meet", "set", "learn", "change", "lead",
    "watch", "follow", "stop", "speak", "read", "spend", "grow", "open",
    "walk", "win", "teach", "offer", "remember", "love", "consider", "appear",
    "buy", "wait", "serve", "die", "send", "build", "stay", "fall", "cut",
    "reach", "kill", "raise", "pass", "sell", "decide", "return", "explain",
    "hope", "develop", "carry", "break", "receive", "agree", "support", "hit",
    "produce", "eat", "cover", "catch", "draw", "choose", "throw", "sing",
    "jump", "swim", "cook", "dance", "climb", "ride", "drive", "fly",
    # Instruction-domain base forms (the demo corpus is how-to ASR).
    "pour", "shake", "mix", "stir", "add", "place", "press", "pull",
    "push", "wash", "chop", "slice", "bake", "boil", "fry", "grill",
    "peel", "spread", "wipe", "fold", "wrap", "attach", "insert",
    "tighten", "loosen", "measure", "heat", "cool", "dry", "fill",
    "drain", "squeeze", "rub", "brush", "spray", "scrub", "flip",
}


def _plausible_pos(word: str) -> Set[str]:
    """Coarse universal-POS candidates for a word (ambiguity-tolerant)."""
    lower = word.lower().strip()
    tags: Set[str] = set()
    if not lower or all(not ch.isalnum() for ch in lower):
        return {"PUNCT"}
    if re.fullmatch(r"[\d.,:%/-]+", lower):
        return {"NUM"}
    for tag, words in _CLOSED_CLASS.items():
        if lower in words:
            tags.add(tag)
    if lower.endswith("ly"):
        tags.add("ADV")
    if lower.endswith(_ADJ_SUFFIXES):
        tags.add("ADJ")
    if lower.endswith(_VERB_SUFFIXES) or lower in _COMMON_VERBS:
        tags.add("VERB")
    # Open-class words are always NOUN candidates (ambiguity tolerance);
    # only pure closed-class hits skip it.
    if lower.endswith(_NOUN_SUFFIXES) or not any(
            t in _CLOSED_CLASS for t in tags):
        tags.add("NOUN")
    if word[:1].isupper():
        tags.add("PROPN")
    return tags


_SUPPORTED_DEPS = {"nsubj", "dobj", "obj", "iobj", "pobj", "det", "amod",
                   "prep", "ROOT"}
_NOMINAL = {"NOUN", "PROPN", "PRON"}


def _plausible_deps(words: Sequence[str], index: int) -> Set[str]:
    """Heuristic dependency-label candidates for words[index] from local
    word order over the POS-lite tags (see module docstring). Ambiguity-
    tolerant by construction: every plausible reading contributes."""
    pos = _plausible_pos(words[index])
    deps: Set[str] = set()
    window = 4

    def tags(j: int) -> Set[str]:
        return _plausible_pos(words[j]) if 0 <= j < len(words) else set()

    if pos & {"VERB", "AUX"}:
        deps.add("ROOT")
    if "DET" in pos:
        deps.add("det")
    if "ADP" in pos:
        deps.add("prep")
    if "ADJ" in pos and tags(index + 1) & _NOMINAL:
        deps.add("amod")
    if pos & _NOMINAL:
        # Preposition immediately before (or one determiner/adjective in
        # between) -> prepositional object.
        for back in (1, 2):
            between = [tags(index - k) for k in range(1, back)]
            if "ADP" in tags(index - back) and all(
                    t & {"DET", "ADJ", "NUM"} for t in between):
                deps.add("pobj")
                break
        # A verb ahead within the window -> subject candidate.
        if any("VERB" in tags(index + k) or "AUX" in tags(index + k)
               for k in range(1, window + 1)):
            deps.add("nsubj")
        # A verb behind within the window, with no preposition in between
        # (that reading is pobj) -> object candidate.
        for k in range(1, window + 1):
            behind = tags(index - k)
            if "ADP" in behind:
                break
            if "VERB" in behind:
                deps.update({"dobj", "obj", "iobj"})
                break
    return deps


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


def _token_matches(spec: Mapping[str, Any], words: Sequence[str],
                   index: int) -> bool:
    if not spec:
        return True  # wildcard {}
    word = words[index]
    lower = word.lower()
    for key, expected in spec.items():
        if key == "OP":
            continue
        if key == "POS":
            wanted = (set(expected["IN"]) if isinstance(expected, Mapping)
                      else {expected})
            if not wanted & _plausible_pos(word):
                return False
            continue
        if key == "DEP":
            wanted = (set(expected["IN"]) if isinstance(expected, Mapping)
                      else {expected})
            unsupported = wanted - _SUPPORTED_DEPS
            if unsupported:
                raise ValueError(
                    f"Unsupported DEP label(s) {sorted(unsupported)} — "
                    f"DEP-lite covers {sorted(_SUPPORTED_DEPS)}")
            if not wanted & _plausible_deps(words, index):
                return False
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
            if position < len(words) and _token_matches(spec, words, position):
                return match_piece(piece_index + 1, position + 1)
            return None
        if op == "?":
            if position < len(words) and _token_matches(spec, words, position):
                result = match_piece(piece_index + 1, position + 1)
                if result is not None:
                    return result
            return match_piece(piece_index + 1, position)
        if op in ("*", "+"):
            minimum = 1 if op == "+" else 0
            count = 0
            while position + count < len(words) and _token_matches(spec, words, position + count):
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
