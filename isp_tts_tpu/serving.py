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


def split_sentences(text: str) -> list[str]:
    """Sentence split for long-form synthesis (shared by
    ``Synthesizer.synthesize_long`` and the daemon's streaming endpoint)."""
    import re

    return [p.strip() for p in
            re.split(r"(?<=[.!?…])\s+", text.strip()) if p.strip()]


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
                 vocoder=None, mesh=None, data_axis: str = "data"):
        self.model = model
        self.config = config or SynthesizerConfig()
        model.eval()
        self._has_speaker = getattr(model, "speaker_embedding", None) is not None
        dynamic = {"duration_factor", "pitch_factor", "pitch_delta",
                   "energy_factor", "energy_delta", "speaker"}
        clash = dynamic & set(self.config.extra_controls)
        if clash:
            raise ValueError(
                f"{sorted(clash)} are dynamic per-request controls — pass "
                "them at call time, not in extra_controls")
        self._graphdef, self._state = nnx.split(model)
        if self.config.weights_dtype is not None:
            self._state = cast_float_state(self._state,
                                           self.config.weights_dtype)
        self._compiled: dict[tuple, callable] = {}

        # -- mesh serving (data-parallel scale-out) --------------------------
        # With a Mesh, weights replicate across it and the batch dim shards
        # over ``data_axis``: one jitted executable serves B/ndev rows per
        # chip with zero collectives in the hot path (batch rows are
        # independent), so throughput scales over ICI. The reference's
        # Accelerate story covers training only; serving there is one GPU
        # (inference.ipynb). Batch buckets round up to multiples of the axis
        # size so shards stay equal.
        self.mesh = mesh
        self._data_axis = data_axis
        self._ndev = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._ndev = int(mesh.shape[data_axis])
            self._replicated = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh,
                                                 PartitionSpec(data_axis))
            self._state = jax.device_put(self._state, self._replicated)

        # optional in-repo neural vocoder (models.vocoder.VocoderModel): the
        # reference's external-TorchScript step (inference.ipynb cell 7)
        # becomes one more bucketed on-device executable
        self.vocoder = None
        if vocoder is not None:
            self.attach_vocoder(vocoder)

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

    def attach_vocoder(self, vocoder) -> None:
        """Wire an in-repo neural vocoder (models.vocoder.VocoderModel) as
        the mel->waveform stage: the reference's external-TorchScript step
        (inference.ipynb cell 7) becomes one more bucketed on-device
        executable. Callable after construction (e.g. to serve a vocoder
        fresh out of its GANTrainer)."""
        vocoder.eval()
        self.vocoder = vocoder
        self._voc_graphdef, self._voc_state = nnx.split(vocoder)
        if self.config.weights_dtype is not None:
            self._voc_state = cast_float_state(
                self._voc_state, self.config.weights_dtype)
        if self.mesh is not None:
            self._voc_state = jax.device_put(self._voc_state,
                                             self._replicated)
        # fused audio executables close over the PREVIOUS vocoder's graphdef;
        # drop them so the next call recompiles against this one
        self._compiled = {k: v for k, v in self._compiled.items()
                          if k[0] != "audio"}
        self._check_vocoder_contract(vocoder)

    @classmethod
    def from_pretrained(cls, path, config: SynthesizerConfig | None = None,
                        vocoder_path=None, mesh=None, data_axis: str = "data"):
        from .models import AcousticModel

        vocoder = None
        if vocoder_path is not None:
            from .models import VocoderModel

            vocoder = VocoderModel.from_pretrained(vocoder_path)
        return cls(AcousticModel.from_pretrained(path), config,
                   vocoder=vocoder, mesh=mesh, data_axis=data_axis)

    # -- shape bucketing -----------------------------------------------------

    def _bucket(self, n: int, buckets: tuple) -> int:
        for b in buckets:
            if n <= b:
                return b
        raise ValueError(f"input of length {n} exceeds the largest bucket {buckets[-1]}")

    def _batch_bucket(self, n: int) -> int:
        """Batch sizes round up like the other dims; beyond the largest
        bucket, to its next multiple (compile count stays bounded). Under a
        mesh the result additionally rounds up to a multiple of the data-axis
        size so every device holds an equal shard."""
        buckets = self.config.batch_buckets
        bb = None
        for b in buckets:
            if n <= b:
                bb = b
                break
        if bb is None:
            top = buckets[-1]
            bb = -(-n // top) * top
        if self._ndev > 1:
            bb = -(-bb // self._ndev) * self._ndev
        return bb

    def _put_batch(self, arr):
        """Upload a batch-leading array, sharded over the mesh's data axis
        when serving over a mesh (committed sharding: jit then partitions
        the executable instead of replicating the batch)."""
        if self.mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(jnp.asarray(arr), self._batch_sharding)

    def _executable(self, text_bucket: int, frame_budget: int, batch: int,
                    use_speaker: bool = False):
        key = (text_bucket, frame_budget, batch, use_speaker)
        fn = self._compiled.get(key)
        if fn is None:
            steps = self.config.steps
            graphdef = self._graphdef

            @jax.jit
            def synth(state, tokens, lens, key, duration_factor, pitch_factor,
                      pitch_delta, energy_factor, energy_delta, speaker):
                m = nnx.merge(graphdef, state)
                mel, ad = m.infer(
                    tokens, text_lengths=lens, max_dec_len=frame_budget,
                    steps=steps, key=key, duration_factor=duration_factor,
                    pitch_factor=pitch_factor, pitch_delta=pitch_delta,
                    energy_factor=energy_factor, energy_delta=energy_delta,
                    speaker=speaker if use_speaker else None,
                    **self.config.extra_controls)
                return mel, ad.dec_lengths

            self._compiled[key] = fn = synth
        return fn

    def _audio_executable(self, text_bucket: int, frame_budget: int,
                          batch: int, use_speaker: bool = False):
        """ONE program for the whole text -> waveform path: acoustic infer +
        vocoder (neural, or matmul Griffin-Lim without one) + clip, fused by
        XLA. One device dispatch per request instead of two — through a
        dispatch-bound front door (the serving daemon's ~30 ms/call relay
        hop) this roughly halves end-to-end latency vs chaining the mel and
        vocoder executables."""
        key = ("audio", text_bucket, frame_budget, batch, use_speaker)
        fn = self._compiled.get(key)
        if fn is None:
            steps = self.config.steps
            graphdef = self._graphdef
            if self.vocoder is not None:
                voc_graphdef = self._voc_graphdef

                def vocode(voc_state, mel):
                    return nnx.merge(voc_graphdef, voc_state).infer(mel)
            else:
                from .ops.vocoder import mel_to_audio_tpu

                geo = self._audio_geometry()

                def vocode(voc_state, mel):
                    return mel_to_audio_tpu(
                        mel, geo["sample_rate"], geo["n_fft"],
                        geo["hop_length"], geo["win_length"], geo["f_min"],
                        geo["f_max"])

            @jax.jit
            def synth_audio(state, voc_state, tokens, lens, key,
                            duration_factor, pitch_factor, pitch_delta,
                            energy_factor, energy_delta, speaker):
                m = nnx.merge(graphdef, state)
                mel, ad = m.infer(
                    tokens, text_lengths=lens, max_dec_len=frame_budget,
                    steps=steps, key=key, duration_factor=duration_factor,
                    pitch_factor=pitch_factor, pitch_delta=pitch_delta,
                    energy_factor=energy_factor, energy_delta=energy_delta,
                    speaker=speaker if use_speaker else None,
                    **self.config.extra_controls)
                audio = jnp.clip(vocode(voc_state, mel), -1.0, 1.0)
                return audio, ad.dec_lengths

            self._compiled[key] = fn = synth_audio
        return fn

    def _hop_length(self) -> int:
        return (self.vocoder.features_config.hop_length
                if self.vocoder is not None
                else self._audio_geometry()["hop_length"])

    def warmup(self, batch_sizes: tuple = (1,), audio: bool | None = None) -> None:
        """Pre-compile every (bucket, budget, batch) executable — including
        the speaker-control variant on multi-speaker checkpoints (it is part
        of the compile-cache key; without this a daemon's first
        speaker-carrying request would stall on a full XLA compile).

        ``audio`` additionally warms the FUSED text->waveform executables
        (the wav serve path); default: on exactly when a neural vocoder is
        attached (the Griffin-Lim fallback is warmable by passing True)."""
        if audio is None:
            audio = self.vocoder is not None
        variants = (False, True) if self._has_speaker else (False,)
        for b in batch_sizes:
            b = self._batch_bucket(b)
            for tb in self.config.text_buckets:
                for fb in self.config.frame_budgets:
                    tokens = self._put_batch(np.zeros((b, tb), np.int32))
                    lens = self._put_batch(np.full((b,), tb, np.int32))
                    spk = self._put_batch(np.zeros((b,), np.int32))
                    for use_speaker in variants:
                        self._executable(tb, fb, b, use_speaker)(
                            self._state, tokens, lens, jax.random.PRNGKey(0),
                            1.0, 1.0, 0.0, 1.0, 0.0, spk)
                        if audio:
                            self._audio_executable(tb, fb, b, use_speaker)(
                                self._state, self._voc_state
                                if self.vocoder is not None else None,
                                tokens, lens, jax.random.PRNGKey(0),
                                1.0, 1.0, 0.0, 1.0, 0.0, spk)
        logger.info("synthesizer warm: %d executables", len(self._compiled))

    # -- serving -------------------------------------------------------------

    def __call__(self, text: str | list[str], seed: int = 0,
                 duration_factor: float = 1.0, pitch_factor: float = 1.0,
                 pitch_delta: float = 0.0, energy_factor: float = 1.0,
                 energy_delta: float = 0.0,
                 speaker: int | list[int] | None = None) -> list[np.ndarray]:
        """Synthesize mel(s); returns a list of (frames, n_mels) arrays.

        The full per-request control surface of the reference's notebook
        serve path (inference.ipynb cells 23-25): duration/pitch/energy
        factors+deltas and the speaker id (scalar, or one per text) — all
        dynamic executable inputs, so no recompile per control change."""
        mel, dec_lens, B = self._synthesize_mel(
            text, seed, duration_factor, pitch_factor, pitch_delta,
            energy_factor, energy_delta, speaker)
        mel = np.asarray(mel)[:B]
        return [mel[i, : int(dec_lens[i])] for i in range(B)]

    def synthesize_audio(self, text: str | list[str], seed: int = 0,
                         duration_factor: float = 1.0, pitch_factor: float = 1.0,
                         pitch_delta: float = 0.0, energy_factor: float = 1.0,
                         energy_delta: float = 0.0,
                         speaker: int | list[int] | None = None) -> list[np.ndarray]:
        """Full text -> waveform serving path, fused into ONE device program
        (acoustic + vocoder + clip): the mel never exists outside the
        executable, and a dispatch-bound front door (the serving daemon) pays
        one device call instead of two. With a neural vocoder attached it is
        the mel->wav stage; without one, on-device matmul Griffin-Lim.
        Returns float32 waveforms clipped to +-1 (the reference's
        inference.ipynb cell 23 contract)."""
        audio, dec_lens, B = self._synthesize_mel(
            text, seed, duration_factor, pitch_factor, pitch_delta,
            energy_factor, energy_delta, speaker, audio=True)
        hop = self._hop_length()
        audio = np.asarray(audio)
        return [audio[i, : int(dec_lens[i]) * hop] for i in range(B)]

    def synthesize_long(self, text: str, seed: int = 0, pause_s: float = 0.25,
                        **controls) -> np.ndarray:
        """Long-form synthesis: split ``text`` into sentences, synthesize
        them as ONE batch (each sentence buckets independently of document
        length, so arbitrarily long inputs never exceed the text buckets),
        and stitch the waveforms with ``pause_s`` of silence. Returns one
        float32 waveform."""
        parts = split_sentences(text)
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
                        pitch_delta: float = 0.0, energy_factor: float = 1.0,
                        energy_delta: float = 0.0,
                        speaker: int | list[int] | None = None,
                        audio: bool = False):
        """Bucketed synthesis; returns the PADDED (B, budget, n_mels) mel
        (or, with ``audio=True``, the fused-executable (B, samples) waveform)
        + per-sample valid frame counts."""
        texts = [text] if isinstance(text, str) else list(text)
        use_speaker = speaker is not None
        if use_speaker and not self._has_speaker:
            raise ValueError(
                "speaker control given but the checkpoint has no "
                "speaker_embedding (single-speaker model)")
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
        spk = np.zeros((Bb,), np.int32)
        if use_speaker:
            ids = [speaker] * B if np.isscalar(speaker) else list(speaker)
            if len(ids) != B:
                raise ValueError(f"speaker list length {len(ids)} != batch {B}")
            spk[:B] = ids

        budgets = self.config.frame_budgets
        while True:
            if audio:
                fn = self._audio_executable(tb, fb, Bb, use_speaker)
                args = (self._state, self._voc_state
                        if self.vocoder is not None else None)
            else:
                fn = self._executable(tb, fb, Bb, use_speaker)
                args = (self._state,)
            mel, dec_lens = fn(*args, self._put_batch(tokens),
                               self._put_batch(lens), jax.random.PRNGKey(seed),
                               float(duration_factor), float(pitch_factor),
                               float(pitch_delta), float(energy_factor),
                               float(energy_delta), self._put_batch(spk))
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
        # mel stays a (possibly mesh-sharded) device array at the PADDED
        # batch: downstream vocoders consume it without a host round-trip,
        # and shard divisibility is preserved; callers slice [:B] on host.
        return mel, dec_lens, B
