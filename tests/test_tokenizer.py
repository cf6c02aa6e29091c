"""CLIP BPE tokenizer tests with HF CLIPTokenizer as oracle.

A tiny-but-real vocab is trained on a toy corpus; the HF slow CLIPTokenizer
(pure-python, same algorithm as OpenAI's) is instantiated from the identical
vocab/merges files and must produce identical ids.
"""

import numpy as np
import pytest

from fitclip_tpu.models.clip.tokenizer import (
    ClipTokenizer, EOT_TOKEN, SOT_TOKEN, bytes_to_unicode, write_tiny_test_vocab,
)

WORDS = ["hello", "hello", "hello", "world", "world", "a", "photo", "photo", "of",
         "of", "of", "a", "a", "cat", "dog", "playing", "playing", "the", "the"]

SAMPLES = [
    "a photo of a cat",
    "hello world",
    "the dog is playing!",
    "A PHOTO OF A DOG",
    "weird   spacing\tand\nnewlines",
    "unicode café üñ",
    "punctuation, lots; of: it?!",
]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    directory = tmp_path_factory.mktemp("vocab")
    merges, vocab = write_tiny_test_vocab(str(directory), WORDS)
    return ClipTokenizer(bpe_path=merges, vocab_path=vocab, context_length=32)


def test_bytes_to_unicode_is_bijective():
    mapping = bytes_to_unicode()
    assert len(mapping) == 256
    assert len(set(mapping.values())) == 256


@pytest.mark.parametrize("text", SAMPLES)
def test_matches_hf_clip_tokenizer(tok, text, tmp_path_factory):
    from transformers import CLIPTokenizer as HFTok

    directory = tmp_path_factory.mktemp("hf_vocab")
    merges, vocab = write_tiny_test_vocab(str(directory), WORDS)
    hf = HFTok(vocab_file=vocab, merges_file=merges)
    expected = hf.convert_tokens_to_ids(hf.tokenize(text))
    actual = tok.encode(text)
    assert actual == expected


def test_batch_shape_and_framing(tok):
    out = tok(["hello world", "a photo of a cat"])
    assert out.shape == (2, 32)
    assert out.dtype == np.int32
    assert (out[:, 0] == tok.sot_id).all()
    for row in out:
        nonzero = row[row != 0]
        assert nonzero[-1] == tok.eot_id


def test_truncation_forces_eot(tok):
    long_text = " ".join(["hello"] * 100)
    out = tok([long_text], context_length=8)
    assert out.shape == (1, 8)
    assert out[0, 0] == tok.sot_id
    assert out[0, -1] == tok.eot_id


def test_eot_has_max_id(tok):
    # The text tower pools at argmax(ids): EOT must be the largest id.
    assert tok.eot_id == tok.vocab_size - 1


def test_decode_round_trip(tok):
    text = "a photo of a cat"
    assert tok.decode(tok.encode(text)).strip() == text


def test_special_tokens_pass_through(tok):
    ids = tok.encode(f"{SOT_TOKEN}hello{EOT_TOKEN}")
    assert tok.sot_id in ids
    assert tok.eot_id in ids


# ---------------------------------------------------------------------------
# Fuzz parity vs the reference's vendored SimpleTokenizer on a mid-size vocab
# (/root/reference/aligner/encoder/slip.py:75-164). The real 49,152-merge
# release isn't fetchable in this zero-egress environment; a ~1.5k-merge vocab
# trained on a mixed ASCII/unicode corpus exercises the same corner cases
# (long merge chains, byte-fallbacks, </w> handling, specials).
# ---------------------------------------------------------------------------

_WORDS = ("the of and a to in is was he for it with as his on be at by i this "
          "had not are but from or have an they which one you were her all she "
          "there would their we him been has when who will more no if out so "
          "said what up its about into than them can only other new some could "
          "time these two may then do first any my now such like our over man "
          "photo video person playing running jumping swimming cooking dancing "
          "première ça日本語中文한국어 straße naïve café jalapeño "
          "aaaaaa bbbbbb abababab xyzzyx").split()


@pytest.fixture(scope="module")
def midsize_vocab_path(tmp_path_factory):
    from fitclip_tpu.models.clip.tokenizer import (train_bpe_merges,
                                                   write_openai_format_vocab)

    rng = np.random.default_rng(0)
    # Zipf-weighted real words + synthetic random words so the pair space is
    # rich enough for >1k merges with realistic long chains.
    letters = np.array(list("abcdefghijklmnopqrstuvwxyzé日ßñ"))
    synthetic = ["".join(rng.choice(letters, size=rng.integers(3, 12)))
                 for _ in range(1200)]
    pool = np.array(_WORDS + synthetic)
    weights = 1.0 / np.arange(1, len(pool) + 1)
    corpus = list(rng.choice(pool, size=40000, p=weights / weights.sum()))
    merges = train_bpe_merges(corpus, num_merges=1500, min_count=2)
    assert len(merges) >= 1000, f"corpus too small, got {len(merges)} merges"
    path = str(tmp_path_factory.mktemp("midvocab") / "bpe_mid_vocab.txt.gz")
    return write_openai_format_vocab(path, merges)


def _fuzz_texts(n: int = 400):
    rng = np.random.default_rng(1)
    pieces = _WORDS + ["'s", "'ll", "don't", "it's", "123", "3.14", "!!!", "?!",
                       "&amp;", "&lt;b&gt;", "...", "--", "№", "€", "🎥", "🐈",
                       "a" * 40, "ab" * 30, "<|startoftext|>", "<|endoftext|>",
                       "UPPER", "MiXeD", "\t", "  ", " "]
    texts = []
    for _ in range(n):
        k = int(rng.integers(1, 12))
        texts.append(" ".join(rng.choice(pieces, size=k)))
    texts += ["", " ", "a", "🎥🎥🎥", "ß" * 25, "\n\nhello\t\tworld\n"]
    return texts


def _reference_simple_tokenizer(bpe_path):
    from tests.reference_oracle import install_reference, reference_available

    if not reference_available():
        pytest.skip("reference tree unavailable")
    install_reference()
    from tests.test_slip import _install_timm_stub

    _install_timm_stub()
    from aligner.encoder.slip import SimpleTokenizer

    return SimpleTokenizer(bpe_path=bpe_path)


def test_fuzz_parity_vs_reference_simple_tokenizer(midsize_vocab_path):

    theirs = _reference_simple_tokenizer(midsize_vocab_path)
    ours = ClipTokenizer(bpe_path=midsize_vocab_path)
    assert ours.vocab_size == len(theirs.encoder)

    mismatches = []
    for text in _fuzz_texts():
        ref_ids = theirs.encode(text)
        our_ids = ours.encode(text)
        if ref_ids != our_ids:
            mismatches.append((text, ref_ids, our_ids))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def test_fuzz_decode_round_trip_matches_reference(midsize_vocab_path):
    theirs = _reference_simple_tokenizer(midsize_vocab_path)
    ours = ClipTokenizer(bpe_path=midsize_vocab_path)
    for text in _fuzz_texts(80):
        ids = ours.encode(text)
        assert ours.decode(ids) == theirs.decode(ids)


# ---------------------------------------------------------------------------
# Full-scale parity: a synthetic 48,894-merge vocab (the exact size of the
# OpenAI release after both implementations' [:49152-256-2] cap) built from
# word-prefix chains, so real fuzz words fire merge chains 10+ deep. The
# released file itself is unfetchable here (zero egress); this covers the
# at-scale behaviors the 1.5k vocab can't: full-depth chains, the merge-count
# cap, and rank tables 30x larger.
# ---------------------------------------------------------------------------

FULL_MERGES = 49152 - 256 - 2


def _synth_full_scale_merges(rng):
    from fitclip_tpu.models.clip.tokenizer import bytes_to_unicode

    byte_encoder = bytes_to_unicode()
    base = list(byte_encoder.values())
    seen_tokens = set(base) | {b + "</w>" for b in base}
    seen_pairs = set()
    merges = []

    def add_word_chain(word: str):
        symbols = ["".join(byte_encoder[b] for b in ch.encode("utf-8"))
                   for ch in word]
        if len(symbols) < 2:
            return
        symbols[-1] += "</w>"
        prefix = symbols[0]
        for nxt in symbols[1:]:
            pair, joined = (prefix, nxt), prefix + nxt
            if pair not in seen_pairs and joined not in seen_tokens:
                seen_pairs.add(pair)
                seen_tokens.add(joined)
                merges.append(pair)
            prefix = joined

    for word in _WORDS:
        add_word_chain(word)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    extra = np.array(list("éßñ日本語€"))
    while len(merges) < FULL_MERGES:
        length = int(rng.integers(3, 11))
        chars = rng.choice(letters, size=length).tolist()
        if rng.random() < 0.05:
            chars[int(rng.integers(length))] = str(rng.choice(extra))
        add_word_chain("".join(chars))
    return merges[:FULL_MERGES]


@pytest.fixture(scope="module")
def fullscale_vocab_path(tmp_path_factory):
    from fitclip_tpu.models.clip.tokenizer import write_openai_format_vocab

    merges = _synth_full_scale_merges(np.random.default_rng(2))
    assert len(merges) == FULL_MERGES
    path = str(tmp_path_factory.mktemp("fullvocab") / "bpe_full_vocab.txt.gz")
    return write_openai_format_vocab(path, merges)


def test_fullscale_vocab_size_matches_release_shape(fullscale_vocab_path):
    # 256 bytes + 256 byte</w> + 48894 merges + 2 specials = 49408, the CLIP
    # release vocab size (slip.py builds the same shape from its merges file).
    ours = ClipTokenizer(bpe_path=fullscale_vocab_path)
    assert ours.vocab_size == 49408


def test_fuzz_parity_vs_reference_at_release_scale(fullscale_vocab_path):
    theirs = _reference_simple_tokenizer(fullscale_vocab_path)
    ours = ClipTokenizer(bpe_path=fullscale_vocab_path)
    assert ours.vocab_size == len(theirs.encoder)

    # Confirm merge chains actually fire so the fuzz isn't vacuous. "the"
    # owns ranks 0-1, so no other chain can preempt it (greedy BPE takes the
    # globally lowest rank — a word like "playing" legitimately splits when
    # "into"'s earlier (i,n) merge outranks its own chain).
    assert len(ours.encode("the")) == 1
    # Chain depth: a full in-vocab word encodes far below its character count.
    assert len(ours.encode("swimming")) <= 5

    mismatches = []
    for text in _fuzz_texts(400):
        ref_ids = theirs.encode(text)
        our_ids = ours.encode(text)
        if ref_ids != our_ids:
            mismatches.append((text, ref_ids, our_ids))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def test_fullscale_decode_round_trip(fullscale_vocab_path):
    theirs = _reference_simple_tokenizer(fullscale_vocab_path)
    ours = ClipTokenizer(bpe_path=fullscale_vocab_path)
    for text in _fuzz_texts(60):
        ids = ours.encode(text)
        assert ours.decode(ids) == theirs.decode(ids)


# ---------------------------------------------------------------------------
# Trained full-scale parity (VERDICT r2 #8): unlike the prefix-chain
# construction above (each pair lives in exactly one chain), a TRAINED vocab
# has genuinely competing merges with frequency-interleaved ranks — the
# at-scale rank-race behavior the release file exhibits. train_bpe_merges is
# the incremental trainer; its equivalence to the textbook O(merges x corpus)
# loop is pinned by test_train_bpe_merges_matches_naive below.
# ---------------------------------------------------------------------------


def _naive_bpe_merges(words, num_merges, min_count=2):
    """The textbook recount-everything BPE loop (the trainer's previous
    implementation), kept as the semantics oracle for the fast trainer."""
    from collections import Counter

    from fitclip_tpu.models.clip.tokenizer import bytes_to_unicode

    byte_encoder = bytes_to_unicode()
    encoded = ["".join(byte_encoder[b] for b in w.encode("utf-8"))
               for w in words]
    corpus = [tuple(w[:-1]) + (w[-1] + "</w>",) for w in encoded if w]
    merges = []
    for _ in range(num_merges):
        counts = Counter(p for word in corpus
                         for p in zip(word[:-1], word[1:]))
        if not counts:
            break
        (first, second), count = max(counts.items(),
                                     key=lambda kv: (kv[1], kv[0]))
        if count < min_count:
            break
        merges.append((first, second))
        new_corpus = []
        for word in corpus:
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_corpus.append(tuple(out))
        corpus = new_corpus
    return merges


def test_train_bpe_merges_matches_naive():
    from fitclip_tpu.models.clip.tokenizer import train_bpe_merges

    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghé日ß"))
    for trial in range(3):
        words = ["".join(rng.choice(letters, size=rng.integers(1, 10)))
                 for _ in range(250)]
        # Overlapping-pair corner cases ("aaa" counts (a,a) twice but merges
        # once) exercise the Counter-delta bookkeeping.
        words += ["aaa", "aaaa", "aaaaaa", "abab", "ababab"]
        fast = train_bpe_merges(words, num_merges=150)
        assert fast == _naive_bpe_merges(words, num_merges=150), trial


@pytest.fixture(scope="module")
def trained_fullscale(tmp_path_factory):
    from fitclip_tpu.models.clip.tokenizer import (train_bpe_merges,
                                                   write_openai_format_vocab)

    rng = np.random.default_rng(11)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyzé日ßñ中한"))
    # Zipf-weighted real words (deep frequent chains) + a wide synthetic tail
    # (every word twice so min_count=2 never starves before FULL_MERGES).
    synth = ["".join(rng.choice(letters, size=rng.integers(3, 14)))
             for _ in range(52000)]
    weights = 1.0 / np.arange(1, len(_WORDS) + 1)
    frequent = list(np.random.default_rng(12).choice(
        np.array(_WORDS), size=30000, p=weights / weights.sum()))
    corpus = frequent + synth * 2
    merges = train_bpe_merges(corpus, num_merges=FULL_MERGES, min_count=2)
    assert len(merges) == FULL_MERGES, len(merges)
    path = str(tmp_path_factory.mktemp("trainedvocab") / "bpe_trained.txt.gz")
    return write_openai_format_vocab(path, merges), synth


def test_trained_fullscale_vocab_parity(trained_fullscale):
    path, synth = trained_fullscale
    theirs = _reference_simple_tokenizer(path)
    ours = ClipTokenizer(bpe_path=path)
    assert ours.vocab_size == len(theirs.encoder) == 49408

    # Frequent words fully merge (trained chains fire to full depth).
    assert len(ours.encode("the")) == 1

    rng = np.random.default_rng(13)
    texts = _fuzz_texts(300)
    # Training-corpus words (seen chains) mixed with unseen text.
    for _ in range(100):
        k = int(rng.integers(1, 8))
        texts.append(" ".join(rng.choice(np.array(synth[:2000]), size=k)))
    mismatches = []
    for text in texts:
        ref_ids = theirs.encode(text)
        our_ids = ours.encode(text)
        if ref_ids != our_ids:
            mismatches.append((text, ref_ids, our_ids))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"
