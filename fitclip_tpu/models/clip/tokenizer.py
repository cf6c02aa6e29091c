"""CLIP byte-level BPE tokenizer, implemented from scratch (no `clip`/HF deps).

Same algorithm as the tokenizer the reference uses via ``clip.tokenize``
(aligner/encoder/clip_video_text_encoder.py:64-65): GPT-2-style byte-to-unicode
encoding, end-of-word ``</w>`` merges, ``<|startoftext|>``/``<|endoftext|>``
specials, lowercasing + whitespace folding, and truncate-to-77 with a forced
EOT in the last slot.

Vocabulary files are data, not code: pass either an OpenAI-format merges file
(``bpe_simple_vocab_16e6.txt.gz`` — ids follow from construction order) or an
HF-format ``vocab.json`` + ``merges.txt`` pair. ``FITCLIP_BPE_PATH`` provides a
default location.
"""

import functools
import gzip
import html
import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import regex as re

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"

_TOKEN_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode map (avoids control chars
    so every byte sequence becomes a clean unicode string)."""
    printable = (list(range(ord("!"), ord("~") + 1))
                 + list(range(ord("¡"), ord("¬") + 1))
                 + list(range(ord("®"), ord("ÿ") + 1)))
    mapping = dict.fromkeys(printable)
    offset = 0
    for byte in range(256):
        if byte in mapping:
            mapping[byte] = chr(byte)
        else:
            mapping[byte] = chr(256 + offset)
            offset += 1
    return mapping


def _get_pairs(word: Tuple[str, ...]) -> set:
    return set(zip(word[:-1], word[1:]))


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _read_merges(path: str) -> List[Tuple[str, str]]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    merges = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#version"):
            continue
        parts = tuple(line.split())
        if len(parts) == 2:
            merges.append(parts)
    # The OpenAI release caps at 48894 usable merges (49152 - 256 - 2).
    return merges[: 49152 - 256 - 2]


class ClipTokenizer:
    def __init__(self, bpe_path: Optional[str] = None,
                 vocab_path: Optional[str] = None,
                 context_length: int = 77) -> None:
        bpe_path = bpe_path or os.environ.get("FITCLIP_BPE_PATH")
        if bpe_path is None or not os.path.exists(bpe_path):
            raise FileNotFoundError(
                "CLIP BPE merges file not found. Provide `bpe_path` or set "
                "FITCLIP_BPE_PATH to bpe_simple_vocab_16e6.txt(.gz) or an HF merges.txt")
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = _read_merges(bpe_path)
        self.bpe_ranks = {pair: i for i, pair in enumerate(merges)}

        if vocab_path:
            with open(vocab_path, encoding="utf-8") as f:
                self.encoder: Dict[str, int] = json.load(f)
        else:
            vocab = list(self.byte_encoder.values())
            vocab.extend(v + "</w>" for v in list(self.byte_encoder.values()))
            vocab.extend("".join(pair) for pair in merges)
            vocab.extend([SOT_TOKEN, EOT_TOKEN])
            self.encoder = {token: i for i, token in enumerate(vocab)}
        self.decoder = {i: token for token, i in self.encoder.items()}
        self.sot_id = self.encoder[SOT_TOKEN]
        self.eot_id = self.encoder[EOT_TOKEN]
        self._bpe_cache: Dict[str, str] = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _bpe(self, token: str) -> str:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    merged.extend(word[i:])
                    break
                merged.extend(word[i:j])
                if j < len(word) - 1 and word[j + 1] == second:
                    merged.append(first + second)
                    i = j + 2
                else:
                    merged.append(word[j])
                    i = j + 1
            word = tuple(merged)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        result = " ".join(word)
        self._bpe_cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids (no specials, no padding)."""
        ids: List[int] = []
        text = _clean_text(text).lower()
        for token in _TOKEN_PATTERN.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(token).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts, context_length: Optional[int] = None,
                 truncate: bool = True) -> np.ndarray:
        """Batch tokenize to a fixed (B, context_length) int32 array, SOT/EOT
        framed and zero padded — `clip.tokenize(truncate=True)` semantics."""
        if isinstance(texts, str):
            texts = [texts]
        length = context_length or self.context_length
        result = np.zeros((len(texts), length), dtype=np.int32)
        for row, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > length:
                if not truncate:
                    raise ValueError(f"Input {row} too long for context length {length}")
                ids = ids[:length]
                ids[-1] = self.eot_id
            result[row, : len(ids)] = ids
        return result


def _inverted_lex_key(pair: Tuple[str, str]) -> Tuple[int, ...]:
    """A tuple that orders ASCENDING exactly where `pair` orders DESCENDING
    lexicographically, so a min-heap pops the count-tie winner that plain
    ``max(counts.items())`` would pick. Each string becomes its negated code
    points plus a ``1`` terminator: the terminator (> any negated code point)
    makes a shorter string sort AFTER its extensions, matching "prefix is
    smaller" in normal string order, and can't collide with a character, so
    the concatenated (first, second) keys compare field-by-field."""
    first, second = pair
    return (tuple(-ord(c) for c in first) + (1,)
            + tuple(-ord(c) for c in second) + (1,))


def _merge_word(word: Tuple[str, ...], first: str, second: str,
                fused: str) -> Tuple[str, ...]:
    out: List[str] = []
    i, n = 0, len(word)
    while i < n:
        if i < n - 1 and word[i] == first and word[i + 1] == second:
            out.append(fused)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe_merges(words: Sequence[str], num_merges: int = 64,
                     min_count: int = 2) -> List[Tuple[str, str]]:
    """The real BPE training loop: repeatedly fuse the most frequent adjacent
    symbol pair (ties broken deterministically by max pair order, exactly as
    ``max(counts.items(), key=lambda kv: (kv[1], kv[0]))`` would) until
    `num_merges` merges exist or no pair repeats. Words are byte-encoded
    first, exactly as the tokenizer sees them.

    Incremental implementation — unique words with frequencies, a pair →
    {word id} inverted index, and a lazily-invalidated heap — so vocabularies
    at the real CLIP release's scale (49,152 merges,
    /root/reference/aligner/encoder/slip.py:75-86's bpe_simple_vocab_16e6)
    train in seconds instead of the naive O(merges × corpus) sweep."""
    import heapq
    from collections import Counter

    byte_encoder = bytes_to_unicode()
    encoded = ("".join(byte_encoder[b] for b in w.encode("utf-8"))
               for w in words)
    word_freq = Counter(tuple(w[:-1]) + (w[-1] + "</w>",)
                        for w in encoded if w)
    corpus = list(word_freq.keys())
    freqs = [word_freq[w] for w in corpus]

    pair_counts: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}
    for wid, word in enumerate(corpus):
        f = freqs[wid]
        for p in zip(word[:-1], word[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wid)

    heap = [(-c, _inverted_lex_key(p), p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: List[Tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        neg_count, _, pair = heapq.heappop(heap)
        count = pair_counts.get(pair, 0)
        if count != -neg_count:
            # Stale entry — every count change already pushed a fresh one.
            continue
        if count < min_count:
            break
        first, second = pair
        fused = first + second
        merges.append(pair)

        touched: set = set()
        for wid in list(pair_words.get(pair, ())):
            word = corpus[wid]
            new_word = _merge_word(word, first, second, fused)
            f = freqs[wid]
            old_pairs = Counter(zip(word[:-1], word[1:]))
            new_pairs = Counter(zip(new_word[:-1], new_word[1:]))
            for p in old_pairs.keys() | new_pairs.keys():
                delta = new_pairs.get(p, 0) - old_pairs.get(p, 0)
                if delta:
                    pair_counts[p] = pair_counts.get(p, 0) + f * delta
                    touched.add(p)
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if new_pairs.get(p, 0) and not old_pairs.get(p, 0):
                    pair_words.setdefault(p, set()).add(wid)
                elif old_pairs.get(p, 0) and not new_pairs.get(p, 0):
                    pair_words[p].discard(wid)
            corpus[wid] = new_word
        pair_words.pop(pair, None)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, _inverted_lex_key(p), p))
    return merges


def write_openai_format_vocab(path: str, merges: Sequence[Tuple[str, str]]) -> str:
    """Write merges in the OpenAI ``bpe_simple_vocab_16e6.txt.gz`` layout: a
    header line (the release's first line is skipped unconditionally by CLIP's
    tokenizer) followed by one merge pair per line, gzipped iff `.gz`."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt", encoding="utf-8") as f:
        # No trailing newline: CLIP's reader slices merges[1:N] after
        # split('\n'), so a trailing empty line would become a phantom
        # zero-length merge token and shift every id after it.
        f.write("#version: 0.2")
        for a, b in merges:
            f.write(f"\n{a} {b}")
    return path


def write_tiny_test_vocab(directory: str, words: Sequence[str]) -> Tuple[str, str]:
    """Build a miniature-but-valid merges/vocab pair for unit tests: merges are
    derived by repeatedly fusing the most frequent pair in `words` (the real
    BPE training loop, tiny corpus)."""
    merges = train_bpe_merges(words, num_merges=64)

    merges_path = os.path.join(directory, "merges.txt")
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: tiny\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")

    byte_vocab = list(bytes_to_unicode().values())
    vocab = byte_vocab + [v + "</w>" for v in byte_vocab] + ["".join(m) for m in merges] \
        + [SOT_TOKEN, EOT_TOKEN]
    vocab_path = os.path.join(directory, "vocab.json")
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump({t: i for i, t in enumerate(vocab)}, f)
    return merges_path, vocab_path
