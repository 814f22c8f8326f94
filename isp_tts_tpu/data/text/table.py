"""Character <-> id coding table.

Parity: reference `tts/data/text/table.py:10-128`:
- charset built from macro names (#punct/#marks/#ru/#en/#ipa_ph)
- service tokens: <pad> (id 0), </s> EOS appended to every utterance
- regex char splitting that keeps <tag> tokens atomic
- encode drops-and-warns unknown characters
"""

from __future__ import annotations

import logging
import re
from collections import OrderedDict
from string import punctuation
from typing import Sequence

from . import symbols as sym

logger = logging.getLogger("isp_tts_tpu")

_CHAR_SPLIT = re.compile(rf"(</?\w+>|[{re.escape(punctuation)}]|\w)")


def split_to_chars(text: str) -> list[str]:
    """Split text into single chars, keeping ``<tag>`` service tokens whole."""
    return [t for t in _CHAR_SPLIT.split(text) if t]


class CodingTable:
    def __init__(self, vocab: tuple, pad: str | None = None, eos: str | None = None):
        for item in (pad, eos):
            if item is not None and not (item.startswith("<") and item.endswith(">")):
                raise ValueError("Service tokens must be formatted as xml-tags")
        self.pad = pad
        self.eos = eos
        service = tuple(t for t in (pad, eos) if t)
        self.vocab = tuple(vocab)
        self.encoding_map = OrderedDict(
            (label, idx) for idx, label in enumerate(service + self.vocab)
        )
        self.decoding_map = OrderedDict((i, l) for l, i in self.encoding_map.items())

    def __len__(self) -> int:
        return len(self.encoding_map)

    def __contains__(self, char: str) -> bool:
        return char in self.encoding_map

    @property
    def charset(self) -> tuple:
        return tuple(self.encoding_map.keys())

    def encode(self, char: str) -> int:
        return self.encoding_map[char]

    def decode(self, idx: int) -> str:
        return self.decoding_map[idx]

    def check_eos(self, text: str) -> str:
        if self.eos is not None and not text.endswith(self.eos):
            return text + self.eos
        return text

    def text_to_vector(self, text: str) -> list[int]:
        unknown: set[str] = set()
        vector = []
        for ch in split_to_chars(text):
            if ch in self.encoding_map:
                vector.append(self.encoding_map[ch])
            else:
                unknown.add(ch)
        if unknown:
            logger.warning("Coding table is missing characters: %s", sorted(unknown))
        return vector

    def vector_to_text(self, vector: Sequence[int]) -> str:
        return "".join(self.decode(int(i)) for i in vector)

    @classmethod
    def from_encoding_map(cls, encoding_map: dict) -> "CodingTable":
        """Rebuild a table from a checkpoint's embedded ``encoding_map``
        (symbol -> id). The stored ids are authoritative — they index the
        text-embedding rows — so the maps are installed verbatim."""
        symbols = [s for s, _ in sorted(encoding_map.items(), key=lambda kv: kv[1])]
        pad = sym.PAD if sym.PAD in encoding_map else None
        eos = sym.EOS if sym.EOS in encoding_map else None
        table = cls(vocab=tuple(s for s in symbols if s not in (pad, eos)),
                    pad=pad, eos=eos)
        table.encoding_map = OrderedDict(
            (s, int(i)) for s, i in sorted(encoding_map.items(), key=lambda kv: kv[1]))
        table.decoding_map = OrderedDict((i, s) for s, i in table.encoding_map.items())
        return table

    @classmethod
    def from_charset(cls, charset: str | Sequence[str]) -> "CodingTable":
        if isinstance(charset, str):
            charset = [charset]
        pad = eos = None
        vocab: list[str] = []
        for item in charset:
            if item == sym.PAD:
                pad = item
            elif item == sym.EOS:
                eos = item
            elif item.startswith("<") and item.endswith(">"):
                vocab.append(item)
            else:
                vocab.extend(sym.CHARSET_MAP.get(item, list(item)))
        unique = list(OrderedDict((c, None) for c in vocab))
        return cls(vocab=tuple(unique), pad=pad, eos=eos)
