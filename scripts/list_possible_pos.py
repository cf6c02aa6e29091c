#!/usr/bin/env python
"""Print the plausible parts of speech for each input word, one line per word.

Mirrors the reference's wordnet-based helper (scripts/list_possible_pos.py:
``wn.synsets(word, pos=...)`` over POS_LIST ``nvars`` — noun/verb/adjective/
adverb/satellite) using the in-tree POS-lite tagger instead of the nltk
wordnet corpus, which is not downloadable in restricted environments. Output
format matches the reference: the concatenated single-letter POS codes
(n=noun, v=verb, a=adjective, r=adverb) for each word, empty when the word
looks like a closed-class/function word only.

    echo -e "run\nquickly\nhappy" | python scripts/list_possible_pos.py
"""
import fileinput
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo.search import _plausible_pos  # noqa: E402

# universal coarse tag -> wordnet single-letter code (POS_LIST order "nvars").
_WORDNET_CODE = {"NOUN": "n", "PROPN": "n", "VERB": "v", "AUX": "v",
                 "ADJ": "a", "ADV": "r"}


def possible_pos(word: str) -> str:
    tags = _plausible_pos(word)
    return "".join(code for code in "nvar"
                   if any(_WORDNET_CODE.get(tag) == code for tag in tags))


if __name__ == "__main__":
    for line in fileinput.input():
        if line := line.strip():
            print(possible_pos(line))
