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
