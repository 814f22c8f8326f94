"""Serving API: bucketed, pre-compilable text -> mel synthesis.

Production wrapper over ``AcousticModel.infer``: XLA compiles one executable
per (text-bucket, frame-budget) shape, so the ``Synthesizer`` rounds inputs
up to configured buckets, caches the jitted executables (optionally warming
them all at startup), and serves single utterances or batches with static
shapes — the TPU-native equivalent of the reference's notebook serve path
(inference.ipynb cells 23-25), designed for steady-state latency.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

logger = logging.getLogger("isp_tts_tpu")


def cast_float_state(state, dtype):
    """Cast float leaves of an nnx state to ``dtype`` (serving-time weight
    compression; integer/bool/PRNG leaves pass through untouched)."""
    from .nn.policy import _NAMES

    target = _NAMES[dtype] if isinstance(dtype, str) else dtype

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(target)
        return leaf

    return jax.tree.map(cast, state)


@dataclass
class SynthesizerConfig:
    text_buckets: tuple = (32, 64, 128, 256)
    frame_budgets: tuple = (256, 512, 1024, 2048)
    #: batch sizes round UP to one of these (beyond the largest: to its next
    #: multiple) so a long document's sentence count doesn't compile a fresh
    #: whole-model executable per distinct batch size
    batch_buckets: tuple = (1, 2, 4, 8, 16, 32)
    frames_per_token: float = 12.0  # frame-budget heuristic before durations
    steps: int = 4
    charset: tuple | None = None  # None = the checkpoint's own encoding_map
    phonemizer: bool = False
    language: str = "en-us"
    extra_controls: dict = field(default_factory=dict)
    #: cast float weights for serving (e.g. "bf16"): halves the weights'
    #: HBM *capacity* footprint. Measured at 23M AND 119M params it does
    #: not move latency — under the bf16 compute policy XLA hoists the
    #: param casts out of the serving loop, so the hot loop streams bf16
    #: bytes either way (docs/PERF_R3.md "Serving at scale").
    weights_dtype: str | None = None


class Synthesizer:
    def __init__(self, model, config: SynthesizerConfig | None = None,
                 vocoder=None):
        self.model = model
        self.config = config or SynthesizerConfig()
        model.eval()
        self._graphdef, self._state = nnx.split(model)
        if self.config.weights_dtype is not None:
            self._state = cast_float_state(self._state,
                                           self.config.weights_dtype)
        self._compiled: dict[tuple, callable] = {}

        # optional in-repo neural vocoder (models.vocoder.VocoderModel): the
        # reference's external-TorchScript step (inference.ipynb cell 7)
        # becomes one more bucketed on-device executable
        self.vocoder = vocoder
        if vocoder is not None:
            vocoder.eval()
            voc_graphdef, self._voc_state = nnx.split(vocoder)
            if self.config.weights_dtype is not None:
                self._voc_state = cast_float_state(
                    self._voc_state, self.config.weights_dtype)
            # one jitted entry point; jax.jit's own cache specializes per
            # (frames, batch) shape
            self._vocode = jax.jit(
                lambda state, mel: nnx.merge(voc_graphdef, state).infer(mel))
            self._check_vocoder_contract(vocoder)

        from .data.providers import TextProvider, TextProviderConfig
        from .data.text.table import CodingTable

        if self.config.charset is not None:
            self.text_provider = TextProvider(TextProviderConfig(
                charset=list(self.config.charset),
                phonemizer=self.config.phonemizer,
                language=self.config.language,
            ))
            served = self.text_provider.coding_table.encoding_map
            trained = getattr(model, "encoding_map", None)
            if trained is not None and dict(served) != dict(trained):
                raise ValueError(
                    "Synthesizer charset disagrees with the checkpoint's "
                    "encoding_map — tokens would hit wrong embeddings. Pass "
                    "charset=None to use the checkpoint's own table.")
        else:
            # authoritative: the coding table embedded in the checkpoint
            self.text_provider = TextProvider(TextProviderConfig(
                charset=["<pad>"], phonemizer=self.config.phonemizer,
                language=self.config.language,
            ))
            self.text_provider.coding_table = CodingTable.from_encoding_map(
                model.encoding_map)

    @classmethod
    def from_pretrained(cls, path, config: SynthesizerConfig | None = None,
                        vocoder_path=None):
        from .models import AcousticModel

        vocoder = None
        if vocoder_path is not None:
            from .models import VocoderModel

            vocoder = VocoderModel.from_pretrained(vocoder_path)
        return cls(AcousticModel.from_pretrained(path), config, vocoder=vocoder)

    # -- shape bucketing -----------------------------------------------------

    def _bucket(self, n: int, buckets: tuple) -> int:
        for b in buckets:
            if n <= b:
                return b
        raise ValueError(f"input of length {n} exceeds the largest bucket {buckets[-1]}")

    def _batch_bucket(self, n: int) -> int:
        """Batch sizes round up like the other dims; beyond the largest
        bucket, to its next multiple (compile count stays bounded)."""
        buckets = self.config.batch_buckets
        for b in buckets:
            if n <= b:
                return b
        top = buckets[-1]
        return -(-n // top) * top

    def _executable(self, text_bucket: int, frame_budget: int, batch: int):
        key = (text_bucket, frame_budget, batch)
        fn = self._compiled.get(key)
        if fn is None:
            steps = self.config.steps
            graphdef = self._graphdef

            @jax.jit
            def synth(state, tokens, lens, key, duration_factor, pitch_factor,
                      pitch_delta):
                m = nnx.merge(graphdef, state)
                mel, ad = m.infer(
                    tokens, text_lengths=lens, max_dec_len=frame_budget,
                    steps=steps, key=key, duration_factor=duration_factor,
                    pitch_factor=pitch_factor, pitch_delta=pitch_delta,
                    **self.config.extra_controls)
                return mel, ad.dec_lengths

            self._compiled[key] = fn = synth
        return fn

    def warmup(self, batch_sizes: tuple = (1,)) -> None:
        """Pre-compile every (bucket, budget, batch) executable."""
        for b in batch_sizes:
            for tb in self.config.text_buckets:
                for fb in self.config.frame_budgets:
                    tokens = jnp.zeros((b, tb), jnp.int32)
                    lens = jnp.full((b,), tb, jnp.int32)
                    self._executable(tb, fb, b)(
                        self._state, tokens, lens, jax.random.PRNGKey(0),
                        1.0, 1.0, 0.0)
        logger.info("synthesizer warm: %d executables", len(self._compiled))

    # -- serving -------------------------------------------------------------

    def __call__(self, text: str | list[str], seed: int = 0,
                 duration_factor: float = 1.0, pitch_factor: float = 1.0,
                 pitch_delta: float = 0.0) -> list[np.ndarray]:
        """Synthesize mel(s); returns a list of (frames, n_mels) arrays."""
        mel, dec_lens = self._synthesize_mel(
            text, seed, duration_factor, pitch_factor, pitch_delta)
        return [mel[i, : int(dec_lens[i])] for i in range(mel.shape[0])]

    def synthesize_audio(self, text: str | list[str], seed: int = 0,
                         duration_factor: float = 1.0, pitch_factor: float = 1.0,
                         pitch_delta: float = 0.0) -> list[np.ndarray]:
        """Full text -> waveform serving path. With a neural vocoder attached
        the mel never leaves the device between the two executables; without
        one, falls back to on-device matmul Griffin-Lim. Returns float32
        waveforms clipped to +-1 (the reference's inference.ipynb cell 23
        contract)."""
        mel, dec_lens = self._synthesize_mel(
            text, seed, duration_factor, pitch_factor, pitch_delta)
        B = mel.shape[0]
        if self.vocoder is not None:
            hop = self.vocoder.features_config.hop_length
            audio = np.asarray(self._vocode(self._voc_state, jnp.asarray(mel)))
        else:
            from .ops.vocoder import mel_to_audio_tpu

            geo = self._audio_geometry()
            hop = geo["hop_length"]
            audio = np.asarray(mel_to_audio_tpu(
                jnp.asarray(mel), geo["sample_rate"], geo["n_fft"],
                geo["hop_length"], geo["win_length"], geo["f_min"],
                geo["f_max"]))
        audio = np.clip(audio, -1.0, 1.0)
        return [audio[i, : int(dec_lens[i]) * hop] for i in range(B)]

    def synthesize_long(self, text: str, seed: int = 0, pause_s: float = 0.25,
                        **controls) -> np.ndarray:
        """Long-form synthesis: split ``text`` into sentences, synthesize
        them as ONE batch (each sentence buckets independently of document
        length, so arbitrarily long inputs never exceed the text buckets),
        and stitch the waveforms with ``pause_s`` of silence. Returns one
        float32 waveform."""
        import re

        parts = [p.strip() for p in
                 re.split(r"(?<=[.!?…])\s+", text.strip()) if p.strip()]
        if not parts:
            raise ValueError("empty text")
        wavs = self.synthesize_audio(parts, seed=seed, **controls)
        sr = (self.vocoder.features_config.sample_rate
              if self.vocoder is not None
              else self._audio_geometry()["sample_rate"])
        pause = np.zeros(int(pause_s * sr), np.float32)
        pieces: list[np.ndarray] = []
        for i, w in enumerate(wavs):
            pieces.append(w)
            if i < len(wavs) - 1:
                pieces.append(pause)
        return np.concatenate(pieces)

    def _check_vocoder_contract(self, vocoder) -> None:
        """The vocoder only inverts mels produced under ITS OWN mel contract;
        a mismatch with the acoustic checkpoint plays audio at the wrong
        speed/pitch (e.g. an official 24 kHz Vocos under a 22.05 kHz acoustic
        model). Detected here, once, instead of as garbled output."""
        fc = vocoder.features_config
        problems = []
        if getattr(fc, "n_mels", None) != self.model.mel_dim:
            problems.append(f"n_mels {fc.n_mels} != model mel_dim "
                            f"{self.model.mel_dim}")
        geo = getattr(self.model.config, "audio_config", None)
        if geo:  # self-describing checkpoint: the full contract is checkable
            for k in ("sample_rate", "n_fft", "hop_length", "win_length",
                      "f_min", "f_max"):
                if geo.get(k) != getattr(fc, k, None):
                    problems.append(
                        f"{k} {getattr(fc, k, None)} != acoustic {geo.get(k)}")
        if problems:
            logger.warning(
                "vocoder mel contract disagrees with the acoustic "
                "checkpoint (%s) — audio will be speed/pitch-shifted or "
                "garbled; retrain or reload the vocoder with matching "
                "features", "; ".join(problems))

    def _audio_geometry(self) -> dict:
        """The checkpoint's mel/audio contract for Griffin-Lim inversion,
        from the self-describing ``audio_config`` injected at train time
        (inject_data_config); checkpoints predating it fall back to the
        framework defaults with a warning (wrong geometry garbles audio)."""
        geo = getattr(self.model.config, "audio_config", None)
        if geo:
            return dict(geo)
        if not getattr(self, "_warned_default_geometry", False):
            self._warned_default_geometry = True
            logger.warning(
                "checkpoint carries no audio_config; assuming the default "
                "mel contract (22.05 kHz, n_fft 1024, hop 256) for "
                "Griffin-Lim — retrain/resave to embed the real geometry")
        # the framework defaults, from their single source of truth (the
        # data-provider configs) — not a re-typed literal that could drift
        from .data.providers import (AudioProviderConfig,
                                     MelScaleProviderConfig,
                                     SpectrogramProviderConfig)

        spec, mel, audio = (SpectrogramProviderConfig(),
                            MelScaleProviderConfig(), AudioProviderConfig())
        return {"sample_rate": audio.sample_rate, "n_fft": spec.n_fft,
                "hop_length": spec.hop_length, "win_length": spec.win_length,
                "f_min": mel.f_min, "f_max": mel.f_max}

    def _synthesize_mel(self, text: str | list[str], seed: int = 0,
                        duration_factor: float = 1.0, pitch_factor: float = 1.0,
                        pitch_delta: float = 0.0):
        """Bucketed mel synthesis; returns the PADDED (B, budget, n_mels)
        array + per-sample valid frame counts."""
        texts = [text] if isinstance(text, str) else list(text)
        encoded = [self.text_provider(t) for t in texts]
        max_len = max(e.vector_len for e in encoded)
        tb = self._bucket(max_len, self.config.text_buckets)
        # the frame budget must scale with slowed-down speech or the adaptor
        # silently clips dec_lengths at the bucket; the ESTIMATE clamps to the
        # largest budget (it is a heuristic — actual saturation is detected
        # from dec_lengths below and retried/warned)
        est_frames = int(max_len * self.config.frames_per_token
                         * max(duration_factor, 1.0))
        fb = self._bucket(min(est_frames, self.config.frame_budgets[-1]),
                          self.config.frame_budgets)

        B = len(texts)
        # the batch dim is bucketed like the others: without it every distinct
        # sentence count (synthesize_long) compiles and caches a fresh
        # whole-model executable. Pad rows carry one <pad> token (length-1
        # keeps the attention softmax non-degenerate) and are sliced off below.
        Bb = self._batch_bucket(B)
        tokens = np.zeros((Bb, tb), np.int32)
        lens = np.ones((Bb,), np.int32)
        for i, e in enumerate(encoded):
            tokens[i, : e.vector_len] = e.vector
            lens[i] = e.vector_len

        budgets = self.config.frame_budgets
        while True:
            fn = self._executable(tb, fb, Bb)
            mel, dec_lens = fn(self._state, jnp.asarray(tokens),
                               jnp.asarray(lens), jax.random.PRNGKey(seed),
                               float(duration_factor), float(pitch_factor),
                               float(pitch_delta))
            dec_lens = np.asarray(dec_lens)[:B]  # drop batch-pad rows
            # dec_lengths == budget means the adaptor CLAMPED the predicted
            # durations at the bucket (documented clamp in the adaptor): a
            # slow-speaking checkpoint would silently lose tail frames.
            # Detect and rerun at the next budget; saturation of the largest
            # bucket is surfaced, not swallowed. An utterance legitimately
            # needing EXACTLY the budget is indistinguishable from a clamped
            # one at this layer, so it costs one conservative rerun (at the
            # larger budget its true dec_len < fb settles the ambiguity).
            saturated = bool((dec_lens >= fb).any())
            if not saturated or fb >= budgets[-1]:
                if saturated:
                    logger.warning(
                        "largest frame budget %d saturated (dec_lens=%s); "
                        "tail frames may be clipped — extend "
                        "SynthesizerConfig.frame_budgets", fb, dec_lens)
                break
            fb = self._bucket(fb + 1, budgets)
            logger.info("frame budget saturated; retrying at %d", fb)
        return np.asarray(mel)[:B], dec_lens
