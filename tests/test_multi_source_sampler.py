"""Golden-sequence tests for the round-robin mixed-batch sampler.

Same expected sequences as the reference's own test
(aligner/tests/data/multi_source_sampler_test.py:18-33): two sources of
lengths 26 (letters) and 10 (digits), runs of 4/3.
"""

import string

from fitclip_tpu.data.multi_source_sampler import RoundRobinMultiSourceSampler

LETTERS = string.ascii_lowercase
DIGITS = list(range(10))
CONCAT = list(LETTERS) + DIGITS


def _sampler(mode):
    return RoundRobinMultiSourceSampler(
        [range(len(LETTERS)), range(len(DIGITS))], sequence_sizes=[4, 3], mode=mode)


def test_min_size_golden():
    sampler = _sampler("min_size")
    expected = ["a", "b", "c", "d", 0, 1, 2, "e", "f", "g", "h", 3, 4, 5,
                "i", "j", "k", "l", 6, 7, 8, "m", "n", "o", "p", 9]
    produced = [CONCAT[i] for i in sampler]
    assert produced == expected
    assert len(sampler) == len(expected)


def test_max_size_cycle_golden():
    sampler = _sampler("max_size_cycle")
    expected = ["a", "b", "c", "d", 0, 1, 2, "e", "f", "g", "h", 3, 4, 5,
                "i", "j", "k", "l", 6, 7, 8, "m", "n", "o", "p", 9, 0, 1,
                "q", "r", "s", "t", 2, 3, 4, "u", "v", "w", "x", 5, 6, 7,
                "y", "z"]
    produced = [CONCAT[i] for i in sampler]
    assert produced == expected
    assert len(sampler) == len(expected)


def test_scalar_sequence_size():
    sampler = RoundRobinMultiSourceSampler([range(4), range(4)], sequence_sizes=2)
    assert [CONCAT[i] for i in sampler]  # just runs
    assert len(sampler) == 8
