"""Procedural formant-synthesized TTS dataset for convergence runs.

Generates utterances whose ACOUSTICS ARE TEXT-DEPENDENT — the property the
aligner/adaptor must exploit to converge:

- each letter maps to a fixed acoustic segment: vowels are voiced harmonic
  tones shaped by two per-letter formants with a per-letter F0 offset;
  consonants are band-passed noise bursts with per-letter center frequency;
- per-letter durations are fixed (word-final lengthening applied), so token
  durations are learnable from text alone;
- speakers differ by F0 base and formant scale (multi-speaker conditioning).

Usage: python tools/make_synth_dataset.py --root /tmp/synth_ds --n 300
Writes root/wavs/*.wav + root/meta.csv (audio_path|speaker|text).
"""

from __future__ import annotations

import argparse
import string
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SR = 22050
VOWELS = "aeiou"
CONSONANTS = "bdfgklmnprstvz"

# per-vowel (F1, F2, F0 offset in semitones, duration s)
VOWEL_TABLE = {
    "a": (850, 1600, 0.0, 0.13),
    "e": (550, 1900, 2.0, 0.11),
    "i": (300, 2300, 4.0, 0.10),
    "o": (450, 900, -2.0, 0.12),
    "u": (350, 800, -4.0, 0.11),
}
# per-consonant (band center Hz, bandwidth Hz, duration s, voiced)
CONS_TABLE = {
    c: (800 + 180 * i, 400 + 40 * i, 0.05 + 0.004 * (i % 5), i % 3 == 0)
    for i, c in enumerate(CONSONANTS)
}

SPEAKERS = {
    "spk0": {"f0": 115.0, "formant_scale": 1.0},
    "spk1": {"f0": 165.0, "formant_scale": 1.1},
    "spk2": {"f0": 215.0, "formant_scale": 1.2},
    # held-out voice for fine-tune runs: F0/formants OUTSIDE the training
    # speakers' range (tools/finetune_synth.py)
    "spk_new": {"f0": 92.0, "formant_scale": 0.88},
}


def _voiced_segment(f0: float, f1: float, f2: float, dur: float,
                    rng: np.random.RandomState) -> np.ndarray:
    n = int(SR * dur)
    t = np.arange(n) / SR
    # slight downward glide makes YIN tracking realistic
    f0_t = f0 * (1.0 - 0.06 * t / max(dur, 1e-3))
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    sig = np.zeros(n)
    for h in range(1, 30):
        fh = h * f0
        if fh > SR / 2 - 500:
            break
        # two-formant spectral envelope + mild tilt
        amp = (1.0 / (1 + ((fh - f1) / 220.0) ** 2)
               + 0.7 / (1 + ((fh - f2) / 300.0) ** 2)) / h ** 0.3
        sig += amp * np.sin(h * phase)
    sig *= 0.25 / (np.abs(sig).max() + 1e-9)
    return sig + 0.002 * rng.randn(n)


def _noise_segment(center: float, bw: float, dur: float, voiced: bool,
                   f0: float, rng: np.random.RandomState) -> np.ndarray:
    n = int(SR * dur)
    noise = rng.randn(n)
    # crude bandpass via FFT masking (no scipy dependency in the hot path)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    mask = np.exp(-0.5 * ((freqs - center) / (bw + 1e-9)) ** 2)
    shaped = np.fft.irfft(spec * mask, n)
    shaped *= 0.12 / (np.abs(shaped).max() + 1e-9)
    if voiced:
        t = np.arange(n) / SR
        shaped += 0.08 * np.sin(2 * np.pi * f0 * 0.8 * t)
    return shaped


def _envelope(n: int, attack: float = 0.01, release: float = 0.02) -> np.ndarray:
    env = np.ones(n)
    na, nr = int(SR * attack), int(SR * release)
    if na > 0:
        env[:na] = np.linspace(0, 1, na)
    if nr > 0 and nr < n:
        env[-nr:] = np.linspace(1, 0, nr)
    return env


def synth_utterance(text: str, speaker: str,
                    rng: np.random.RandomState) -> np.ndarray:
    spk = SPEAKERS[speaker]
    pieces = [np.zeros(int(SR * 0.04))]
    words = text.rstrip(".").split(" ")
    for wi, word in enumerate(words):
        for li, ch in enumerate(word):
            final = li == len(word) - 1 and wi == len(words) - 1
            if ch in VOWEL_TABLE:
                f1, f2, semi, dur = VOWEL_TABLE[ch]
                if final:
                    dur *= 1.4
                f0 = spk["f0"] * 2 ** (semi / 12.0)
                seg = _voiced_segment(f0, f1 * spk["formant_scale"],
                                      f2 * spk["formant_scale"], dur, rng)
            else:
                center, bw, dur, voiced = CONS_TABLE[ch]
                if final:
                    dur *= 1.3
                seg = _noise_segment(center * spk["formant_scale"], bw, dur,
                                     voiced, spk["f0"], rng)
            pieces.append(seg * _envelope(len(seg)))
        pieces.append(np.zeros(int(SR * 0.06)))  # inter-word gap
    pieces.append(np.zeros(int(SR * 0.04)))
    return np.concatenate(pieces).astype(np.float32)


def random_text(rng: np.random.RandomState) -> str:
    n_words = rng.randint(2, 7)
    words = []
    for _ in range(n_words):
        n_char = rng.randint(2, 7)
        chars = []
        for i in range(n_char):
            # alternate consonant/vowel-ish for pronounceable structure
            pool = VOWELS if i % 2 == 1 else CONSONANTS
            chars.append(pool[rng.randint(len(pool))])
        words.append("".join(chars))
    return " ".join(words) + "."


def generate(root: Path, n_utts: int = 300, seed: int = 0,
             speakers: list[str] | None = None) -> None:
    from isp_tts_tpu.data.audio import write_wav

    rng = np.random.RandomState(seed)
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    lines = []
    # default: the 3 training voices (spk_new is fine-tune-only)
    speakers = speakers or ["spk0", "spk1", "spk2"]
    for i in range(n_utts):
        text = random_text(rng)
        speaker = speakers[i % len(speakers)]
        wav = synth_utterance(text, speaker, rng)
        name = f"u{i:04d}.wav"
        write_wav(root / "wavs" / name, wav, SR)
        lines.append(f"wavs/{name}|{speaker}|{text}")
    (root / "meta.csv").write_text("\n".join(lines) + "\n")
    durs = [len(synth_utterance(l.split('|')[2], l.split('|')[1],
                                np.random.RandomState(1))) / SR
            for l in lines[:20]]
    print(f"wrote {n_utts} utterances to {root} "
          f"(sample durations {min(durs):.2f}-{max(durs):.2f}s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, required=True)
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speakers", nargs="+", default=None,
                    help="speaker names (default spk0 spk1 spk2)")
    args = ap.parse_args()
    generate(args.root, args.n, args.seed, args.speakers)
