"""Espeak-ng G2P with word-level grapheme/phoneme mixing.

Capability parity with reference `tts/data/text/phonemes.py:9-245`: the
espeak backend phonemizes whole utterances, and ``mask_phonemes`` keeps a
random subset of words as graphemes (phoneme masking regularization,
reference providers.py:229-263).

The ``phonemizer`` package (espeak-ng) is an optional dependency; importing
this module without it raises only when a Phonemizer is constructed, so
grapheme-only pipelines (e.g. the ru_en recipe with stress marks) work in
minimal environments.

Word-level mapping strategy (reference phonemes.py:86-245): the sweep /
backtracking group search in ``word_level.align_word_groups`` partitions the
utterance and its whole-string conversion into aligned groups, preserving
espeak's cross-word phonetic context even when the engine merges or splits
words. A fast path zips words directly when the separator-based counts
already line up; per-word re-phonemization remains as the last-resort
fallback (it loses cross-word context, so it only runs when the group
search fails).
"""

from __future__ import annotations

import logging
import random

from .word_level import WordAlignmentError, align_word_groups

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

    def phonemize_words(self, text: str) -> list[tuple[str, str | None]]:
        """[(text_group, phoneme_group)] pairs covering the utterance.

        Groups come from the word-level sweep/backtracking search
        (reference phonemes.py:86-245) over the WHOLE-string conversion, so
        espeak's cross-word phonetic context survives even when the engine
        merges words ("on the" -> one phonetic word) or splits them. A
        phoneme_group of None means the text group converts to nothing.

        Fast path: when separator-based word counts already line up, zip
        directly (one conv_fn call instead of many probes). Last resort when
        the group search fails: per-word re-phonemization (loses cross-word
        context but guarantees coverage).
        """
        words = text.split(" ")
        phon_words = [w for w in self._phonemize_raw(text).split("|") if w != ""]
        if len(phon_words) == len(words):
            return list(zip(words, phon_words))
        try:
            text_groups, _, conv_groups = align_word_groups(
                text, self.phonemize_text)
            return list(zip(text_groups, conv_groups))
        except (WordAlignmentError, AssertionError):
            logger.debug("word-level group search failed for %r; "
                         "per-word fallback", text)
        per_word = [self._phonemize_raw(w).replace("|", " ") for w in words]
        return list(zip(words, per_word))

    def __call__(self, text: str, mask_phonemes: bool | float = False,
                 rng: random.Random | None = None) -> str:
        """Phonemize; with probability ``mask_phonemes`` keep a group's
        graphemes instead of its phonemes (word-level regularization,
        reference phonemes.py:17-45)."""
        rng = rng or random
        if not mask_phonemes:
            return self.phonemize_text(text)
        try:
            pairs = self.phonemize_words(text)
        except Exception:
            logger.debug("word-level phonemization failed; whole-string fallback")
            return self.phonemize_text(text)
        prob = 1.0 if mask_phonemes is True else float(mask_phonemes)
        out_words = []
        for word, phon in pairs:
            if rng.random() < prob:
                out_words.append(word)
            elif phon is not None:
                out_words.append(phon)
        return " ".join(out_words)
