"""Golden espeak-ng fixture corpus (VERDICT r2 item 6).

`tests/fixtures/espeak_golden.json` pins the espeak phonemization contract as
tightly as a zero-egress environment allows: context-sensitive whole-string
conversions (including the reference's own documented worked example,
"on the internet" -> "ɔnðɪ|ˈɪntɚnˌɛt" while "on the" alone -> "ɔnðə",
reference phonemes.py:219) plus per-word fallbacks for probe strings. The
fixture backend answers exactly like the espeak construction in
`data/text/phonemes.py` (Separator(phone='', word='|'), strip=True).

Covered end-to-end: Phonemizer group search over merge / split / drop /
context-dependent-pronunciation cases, word-level phoneme masking, and
TextProvider -> CodingTable encoding of the resulting IPA.
"""

import json
import logging
import random
from pathlib import Path

import numpy as np
import pytest

from isp_tts_tpu.data.text.phonemes import Phonemizer

FIXTURE = Path(__file__).parent / "fixtures" / "espeak_golden.json"


class GoldenBackend:
    """Answers phonemize() from the golden corpus: exact phrase entries pin
    context-sensitive conversions; any other string is the '|'-join of its
    per-word entries (espeak's context-free behavior). Unknown words raise —
    goldens must stay closed over every probe the group search makes."""

    def __init__(self):
        data = json.loads(FIXTURE.read_text())
        self.words = data["words"]
        self.phrases = data["phrases"]
        self.calls: list[str] = []

    def phonemize(self, texts, separator=None, strip=True):
        out = []
        for text in texts:
            self.calls.append(text)
            if text in self.phrases:
                out.append(self.phrases[text])
                continue
            parts = [self.words[w] for w in text.split(" ")]
            out.append("|".join(p for p in parts if p != ""))
        return out


@pytest.fixture()
def phonemizer():
    return Phonemizer(backend=GoldenBackend())


def test_reference_worked_example_merge(phonemizer):
    """The gist's documented case: 'on the' merges into one phonetic word
    whose isolated conversion differs ('ɔnðə' vs 'ɔnðɪ') — the backtracking
    search must still find the [on the][internet] grouping."""
    pairs = phonemizer.phonemize_words("on the internet")
    assert pairs == [("on the", "ɔnðɪ"), ("internet", "ˈɪntɚnˌɛt")]


def test_context_dependent_pronunciation(phonemizer):
    """'read' converts to ɹˈɛd in 'i read it' but ɹˈiːd alone; grouping must
    preserve the in-context pronunciation (NOT re-phonemize per word)."""
    pairs = phonemizer.phonemize_words("i read it on the internet")
    assert pairs == [
        ("i", "ˈaɪ"), ("read", "ɹˈɛd"), ("it", "ɪt"),
        ("on the", "ɔnðɪ"), ("internet", "ˈɪntɚnˌɛt"),
    ]


def test_dropped_token_yields_none_group(phonemizer):
    """A token converting to nothing ('-' under strip) maps to a None group
    and vanishes from phonemized output while masking can still restore it."""
    pairs = phonemizer.phonemize_words("wait - stop")
    assert pairs == [("wait", "wˈeɪt"), ("-", None), ("stop", "stˈɑːp")]
    assert phonemizer("wait - stop", mask_phonemes=False) == "wˈeɪt stˈɑːp"
    assert phonemizer("wait - stop", mask_phonemes=1.0) == "wait - stop"


def test_split_word_groups_as_one_to_many(phonemizer):
    """One text word producing two phonetic words stays one group."""
    pairs = phonemizer.phonemize_words("the moonlight")
    assert pairs == [("the", "ðə"), ("moonlight", "mˈuːn lˈaɪt")]


def test_masking_mixture_over_golden_groups(phonemizer):
    rng = random.Random(3)
    outs = {phonemizer("i read it on the internet", mask_phonemes=0.5,
                       rng=rng) for _ in range(64)}
    # group-atomic masking: 'on the' flips as a unit
    assert any("ɔnðɪ" in o for o in outs)
    assert any("on the" in o for o in outs)
    assert not any(("on" in o.split(" ") and "ɔnðɪ" in o) for o in outs)


def test_text_provider_encodes_golden_ipa(caplog):
    """TextProvider -> Phonemizer(golden) -> CodingTable end-to-end: the IPA
    output must encode with zero unknown-character warnings and decode back."""
    from isp_tts_tpu.data.providers import TextProvider, TextProviderConfig

    provider = TextProvider(TextProviderConfig(
        charset=["<pad>", "</s>", "#punct", "#en", "#ipa_ph"],
        phonemizer=False,  # constructed below with the injected backend
    ))
    provider.text_processor.phonemizer = Phonemizer(backend=GoldenBackend())

    with caplog.at_level(logging.WARNING, logger="isp_tts_tpu"):
        data = provider("I read it on the internet.")
    assert not [r for r in caplog.records if "unknown" in r.message.lower()]
    assert data.vector_len > 0
    decoded = provider.coding_table.vector_to_text(data.vector)
    assert "ɔnðɪ" in decoded and "ɹˈɛd" in decoded
    assert np.asarray(data.vector).min() >= 0
