"""Espeak-ng G2P with word-level grapheme/phoneme mixing.

Capability parity with reference `tts/data/text/phonemes.py:9-245`: the
espeak backend phonemizes whole utterances, and ``mask_phonemes`` keeps a
random subset of words as graphemes (phoneme masking regularization,
reference providers.py:229-263).

The ``phonemizer`` package (espeak-ng) is an optional dependency; importing
this module without it raises only when a Phonemizer is constructed, so
grapheme-only pipelines (e.g. the ru_en recipe with stress marks) work in
minimal environments.

Word-level mapping strategy: phonemize with an explicit word separator and
zip with the input words when counts line up; fall back to whole-string
phonemization otherwise (the reference uses a backtracking group-search for
the same goal).
"""

from __future__ import annotations

import logging
import random

logger = logging.getLogger("isp_tts_tpu")


class Phonemizer:
    def __init__(self, language: str = "en-us", preserve_punctuation: bool = True,
                 with_stress: bool = True):
        try:
            from phonemizer.backend import EspeakBackend
            from phonemizer.separator import Separator
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "The `phonemizer` package (with espeak-ng) is required for "
                "phoneme pipelines; install extras `isp-tts-tpu[text]`."
            ) from e
        self._separator = Separator(phone="", word="|")
        self._backend = EspeakBackend(
            language,
            preserve_punctuation=preserve_punctuation,
            with_stress=with_stress,
            language_switch="remove-flags",
        )

    def phonemize_text(self, text: str) -> str:
        out = self._backend.phonemize([text], separator=self._separator, strip=True)
        return out[0].replace("|", " ")

    def phonemize_words(self, text: str) -> list[tuple[str, str]]:
        """[(word, phonemes)] pairs; raises if alignment fails."""
        words = text.split(" ")
        out = self._backend.phonemize([text], separator=self._separator, strip=True)[0]
        phon_words = [w for w in out.split("|") if w != ""]
        if len(phon_words) != len(words):
            raise ValueError("word count mismatch after phonemization")
        return list(zip(words, phon_words))

    def __call__(self, text: str, mask_phonemes: bool | float = False,
                 rng: random.Random | None = None) -> str:
        """Phonemize; with probability ``mask_phonemes`` keep a word's
        graphemes instead of its phonemes (word-level regularization)."""
        rng = rng or random
        if not mask_phonemes:
            return self.phonemize_text(text)
        try:
            pairs = self.phonemize_words(text)
        except Exception:
            logger.debug("word-level phonemization failed; whole-string fallback")
            return self.phonemize_text(text)
        prob = 1.0 if mask_phonemes is True else float(mask_phonemes)
        out_words = [
            word if rng.random() < prob else phon for word, phon in pairs
        ]
        return " ".join(out_words)
