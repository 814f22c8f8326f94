"""Word-level sweep/backtracking group search (reference phonemes.py:86-245).

A fake context-sensitive G2P exercises the hard cases the reference
algorithm exists for: word merging with neighbor-dependent output
("on the" -> one phonetic word whose vowel depends on the NEXT word),
word splitting (one text word -> two phonetic words), groups that map to
nothing, and punctuation attachment.
"""

import pytest

from isp_tts_tpu.data.text.phonemes import Phonemizer
from isp_tts_tpu.data.text.word_level import WordAlignmentError, align_word_groups

TABLE = {
    "internet": "ɪntɚnɛt", "shelf": "ʃɛlf", "look": "lʊk", "stop": "stɑp",
    "it": "ɪt", "up": "ʌp", "now.": "naʊ.",
}


def fake_conv(text: str) -> str:
    """Espeak-like conversion: merges "on the" into one output word whose
    vowel depends on the following word; splits "cannot"; drops "uh"."""
    words = text.split(" ")
    out, i = [], 0
    while i < len(words):
        w = words[i]
        if w == "on" and i + 1 < len(words) and words[i + 1] == "the":
            nxt = words[i + 2] if i + 2 < len(words) else ""
            out.append("ɔnðɪ" if nxt.startswith(tuple("aeiouɪ")) else "ɔnðə")
            i += 2
        elif w == "cannot":
            out += ["kæn", "nɑt"]
            i += 1
        elif w == "uh":
            i += 1  # converts to nothing
        else:
            out.append(TABLE.get(w, w + "ˈ"))
            i += 1
    return " ".join(out)


def test_merged_word_with_context():
    """The classic case: "on the" merges AND its vowel depends on the next
    word, so per-word re-phonemization would produce the wrong vowel."""
    groups, conv, conv_groups = align_word_groups("look on the internet", fake_conv)
    assert conv == "lʊk ɔnðɪ ɪntɚnɛt"
    assert groups == ["look", "on the", "internet"]
    assert conv_groups == ["lʊk", "ɔnðɪ", "ɪntɚnɛt"]
    # context preserved: the group carries the in-context vowel ɪ, which
    # fake_conv("on the") alone would NOT produce
    assert fake_conv("on the") == "ɔnðə"


def test_split_word():
    groups, conv, conv_groups = align_word_groups("cannot stop", fake_conv)
    assert groups == ["cannot", "stop"]
    assert conv_groups == ["kæn nɑt", "stɑp"]


def test_group_mapping_to_nothing():
    groups, conv, conv_groups = align_word_groups("look uh stop", fake_conv)
    assert " ".join(groups) == "look uh stop"
    assert " ".join(g for g in conv_groups if g is not None) == conv
    assert None in conv_groups or any("uh" in g for g in groups)


def test_punctuation_attachment():
    groups, conv, conv_groups = align_word_groups("stop it now.", fake_conv)
    assert groups == ["stop", "it", "now."]
    assert conv_groups == ["stɑp", "ɪt", "naʊ."]


def test_mixed_sentence_invariants():
    text = "look on the internet cannot stop it up now."
    groups, conv, conv_groups = align_word_groups(text, fake_conv)
    assert " ".join(groups) == text
    assert " ".join(g for g in conv_groups if g is not None) == conv
    assert "on the" in groups  # merge kept as one group
    assert conv_groups[groups.index("on the")] == "ɔnðɪ"


def test_inconsistent_conversion_raises():
    calls = {"n": 0}

    def unstable(text: str) -> str:
        calls["n"] += 1
        return " ".join(w + str(calls["n"]) for w in text.split(" "))

    with pytest.raises(WordAlignmentError):
        align_word_groups("a b c d e f g h i j", unstable)


class ContextFakeBackend:
    """Backend wrapper exposing fake_conv through the phonemizer protocol."""

    def phonemize(self, texts, separator=None, strip=True):
        return ["|".join(fake_conv(t).split(" ")) for t in texts]


def test_phonemizer_masking_uses_groups():
    ph = Phonemizer(backend=ContextFakeBackend())
    pairs = ph.phonemize_words("look on the internet")
    assert ("on the", "ɔnðɪ") in pairs
    # unmasked: pure phonemes with context
    assert ph("look on the internet", mask_phonemes=1e-12) == "lʊk ɔnðɪ ɪntɚnɛt"
    # fully masked: original text
    assert ph("look on the internet", mask_phonemes=1.0) == "look on the internet"
