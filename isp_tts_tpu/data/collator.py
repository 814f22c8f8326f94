"""Pad-collate with TPU shape bucketing.

Capability parity with reference `tts/data/collator.py:10-95` (two-phase
reserve + copy pad-collation), with the TPU-critical divergence that padded
lengths are rounded UP to bucket multiples so only a handful of distinct
shapes ever reach XLA (static-shape compilation cache). The reference's
speaker-written-into-energy bug (:88) is fixed by intent.

Outputs channel-last mel (B, frames, n_mels).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from .dataset import AcousticSample


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass
class AcousticCollatorConfig:
    text_pad_multiple: int = 16
    mel_pad_multiple: int = 64
    max_text_len: int | None = None
    max_mel_len: int | None = None
    #: pad every batch to (max_text_len, max_mel_len) unconditionally.
    #: REQUIRED in multi-process runs: each process collates only its local
    #: shard, and bucketing by the local max would let processes disagree on
    #: the padded shape of the same global batch (the global array assembly
    #: then fails or silently misaligns). The Trainer forces this on when
    #: jax.process_count() > 1.
    fixed_shape: bool = False


class AcousticCollator:
    Config = AcousticCollatorConfig

    def __init__(self, config: AcousticCollatorConfig | None = None, **kw):
        self.config = config or AcousticCollatorConfig(**kw)

    def __call__(self, batch: Sequence[AcousticSample]) -> dict:
        cfg = self.config
        B = len(batch)
        ref = batch[0]
        n_mels = ref.mel.shape[1]

        text_lens = np.asarray([s.text_vector_len for s in batch], np.int32)
        mel_lens = np.asarray([s.mel_len for s in batch], np.int32)

        if cfg.fixed_shape:
            if cfg.max_text_len is None or cfg.max_mel_len is None:
                raise ValueError(
                    "fixed_shape collation requires max_text_len and "
                    "max_mel_len (process-independent batch shapes)")
            T, M = cfg.max_text_len, cfg.max_mel_len
        else:
            T = round_up(int(text_lens.max()), cfg.text_pad_multiple)
            M = round_up(int(mel_lens.max()), cfg.mel_pad_multiple)
            if cfg.max_text_len is not None:
                T = min(T, cfg.max_text_len)
            if cfg.max_mel_len is not None:
                M = min(M, cfg.max_mel_len)
        text_lens = np.minimum(text_lens, T)
        mel_lens = np.minimum(mel_lens, M)

        text = np.zeros((B, T), np.int32)
        mel = np.zeros((B, M, n_mels), np.float32)
        pitch = np.zeros((B, M), np.float32) if ref.pitch is not None else None
        energy = np.zeros((B, M), np.float32) if ref.energy is not None else None
        speaker = np.zeros((B,), np.int32) if ref.speaker is not None else None

        for i, s in enumerate(batch):
            tl, ml = int(text_lens[i]), int(mel_lens[i])
            text[i, :tl] = s.text_vector[:tl]
            mel[i, :ml] = s.mel[:ml]
            if pitch is not None:
                pitch[i, :ml] = s.pitch[:ml]
            if energy is not None:
                energy[i, :ml] = s.energy[:ml]
            if speaker is not None:
                speaker[i] = s.speaker

        out = {
            "filename": [s.filename for s in batch],
            "text": [s.text for s in batch],
            "text_vector": text,
            "text_vector_len": text_lens,
            "mel": mel,
            "mel_len": mel_lens,
        }
        if pitch is not None:
            out["pitch"] = pitch
        if energy is not None:
            out["energy"] = energy
        if speaker is not None:
            out["speaker"] = speaker
        return out
