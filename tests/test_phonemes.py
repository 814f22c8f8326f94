"""Phonemizer behavior with an injected fake backend (no espeak needed)."""

import random

from isp_tts_tpu.data.text.phonemes import Phonemizer

# toy G2P: each word maps to its uppercase reverse, '|'-joined
G2P = {
    "hello": "OLEH", "world": "DLROW", "don't": "TNOD", "go": "OG",
}


class FakeBackend:
    def __init__(self, merge_words: bool = False):
        self.merge = merge_words

    def phonemize(self, texts, separator=None, strip=True):
        out = []
        for text in texts:
            words = [G2P.get(w, w.upper()[::-1]) for w in text.split(" ")]
            if self.merge and len(words) > 1:
                # emulate espeak merging two words into one output group
                words = [words[0] + words[1]] + words[2:]
            out.append("|".join(words))
        return out


def test_phonemize_text():
    ph = Phonemizer(backend=FakeBackend())
    assert ph.phonemize_text("hello world") == "OLEH DLROW"


def test_word_level_masking_extremes():
    ph = Phonemizer(backend=FakeBackend())
    # prob 1.0: every word keeps graphemes
    assert ph("hello world", mask_phonemes=1.0) == "hello world"
    # prob ~0: every word phonemized
    assert ph("hello world", mask_phonemes=1e-12) == "OLEH DLROW"
    # off: plain phonemization
    assert ph("hello world", mask_phonemes=False) == "OLEH DLROW"


def test_word_level_masking_mixture():
    ph = Phonemizer(backend=FakeBackend())
    rng = random.Random(0)
    outs = {ph("hello world go", mask_phonemes=0.5, rng=rng) for _ in range(32)}
    # mixtures of graphemes and phonemes occur
    assert any("hello" in o and "DLROW" in o for o in outs)
    assert all(len(o.split(" ")) == 3 for o in outs)


def test_word_count_mismatch_group_search():
    """When the engine merges words, the group search aligns the merged
    output as a single group, keeping cross-word phonetic context
    (reference phonemes.py:86-245) instead of re-phonemizing per word."""
    ph = Phonemizer(backend=FakeBackend(merge_words=True))
    pairs = ph.phonemize_words("hello world go")
    assert pairs == [("hello world", "OLEHDLROW"), ("go", "OG")]
    # masking operates on groups and covers the whole text
    out = ph("hello world go", mask_phonemes=1.0)
    assert out == "hello world go"
    out = ph("hello world go", mask_phonemes=1e-12)
    assert out == "OLEHDLROW OG"
