"""Text processing pipeline: cleaners -> lowercase -> optional phonemizer.

Parity: reference `tts/data/text/processor.py:19-27` (always-on
punct_corrector appended to the cleaner chain).
"""

from __future__ import annotations

from typing import Callable

from .cleaners import CLEANERS, punct_corrector


class TextProcessor:
    def __init__(self, cleaners: list[str | Callable] | None = None,
                 language: str = "en-us", phonemizer: bool = False):
        chain: list[Callable] = []
        for c in cleaners or []:
            chain.append(CLEANERS[c] if isinstance(c, str) else c)
        chain.append(punct_corrector)
        self.cleaners = chain
        self.language = language
        self.phonemizer = None
        if phonemizer:
            from .phonemes import Phonemizer

            self.phonemizer = Phonemizer(language=language)

    def __call__(self, text: str, mask_phonemes: bool | float = False) -> str:
        for cleaner in self.cleaners:
            text = cleaner(text)
        text = text.lower()
        if self.phonemizer is not None:
            text = self.phonemizer(text, mask_phonemes=mask_phonemes)
        return text
