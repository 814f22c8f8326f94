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
                 with_stress: bool = True, backend=None):
        """``backend`` injection: any object with
        ``phonemize([text], separator=..., strip=True) -> [str]`` where words
        are joined by '|' — used for testing without espeak, or to swap in a
        different G2P engine."""
        if backend is not None:
            self._backend = backend
            self._separator = None
            return
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

    def _phonemize_raw(self, text: str) -> str:
        return self._backend.phonemize([text], separator=self._separator,
                                       strip=True)[0]

    def phonemize_text(self, text: str) -> str:
        return self._phonemize_raw(text).replace("|", " ")

    def phonemize_words(self, text: str) -> list[tuple[str, str]]:
        """[(word, phonemes)] pairs.

        First tries whole-utterance phonemization with word-separator
        alignment (keeps espeak's cross-word context); if the engine merged
        or split words (counts disagree), falls back to phonemizing each word
        individually, which guarantees the alignment the masking needs
        (the reference solves the same problem with a backtracking group
        search over the merged output, phonemes.py:86-245)."""
        words = text.split(" ")
        phon_words = [w for w in self._phonemize_raw(text).split("|") if w != ""]
        if len(phon_words) == len(words):
            return list(zip(words, phon_words))
        per_word = [self._phonemize_raw(w).replace("|", " ") for w in words]
        return list(zip(words, per_word))

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
