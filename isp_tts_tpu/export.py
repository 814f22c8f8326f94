"""AOT serving export: a self-contained StableHLO deployment artifact.

``export_serving`` serializes ONE bucketed serving executable — tokens ->
(mel, dec_lengths), or tokens -> (waveform, dec_lengths) when a vocoder is
attached — via ``jax.export``, with the model weights baked in as
constants. The artifact is a zip holding the serialized function plus a
JSON header (coding table, audio geometry, shapes, controls), so a
deployment host needs NO model code and NO checkpoint: ``ExportedSynthesizer``
reconstructs text->audio from the artifact alone. This is a deployment
surface the torch reference cannot offer (its serve path needs the full
Python model class to unpickle a checkpoint, base.py:38-56).

Platform notes: an export is compiled-for the platform(s) it was lowered
for (``jax.export`` embeds StableHLO, so it survives XLA version changes
within the export compatibility window). Lowering for TPU from a CPU-only
host works because lowering is ahead-of-time; pass ``platforms=("cpu",
"tpu")`` to produce one artifact that runs on both.
"""

from __future__ import annotations

import json
import logging
import zipfile

import numpy as np


def jax_default_backend() -> str:
    import jax

    return jax.default_backend()

logger = logging.getLogger("isp_tts_tpu")

_META_NAME = "meta.json"
_FN_NAME = "fn.jaxexport"
_EXEC_NAME = "exec.xla"
FORMAT_VERSION = 1


def _device_fingerprint() -> dict:
    """Identity of the compile target a pre-compiled executable is valid
    for. An embedded executable loads ONLY on a matching host; everything
    else falls back to the portable StableHLO + (cached) compile path."""
    import jax

    dev = jax.devices()[0]
    return {
        "platform": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", "unknown"),
        "jax_version": jax.__version__,
    }


def export_serving(synth, path, text_bucket: int, frame_budget: int,
                   batch: int = 1, use_speaker: bool = False,
                   platforms: tuple | None = None,
                   precompile: bool = False) -> dict:
    """Export one (text_bucket, frame_budget, batch) serving executable.

    Args:
      synth: a ``serving.Synthesizer`` (with or without a neural vocoder).
      path: output artifact path (zip).
      platforms: e.g. ``("cpu", "tpu")`` for a multi-platform artifact;
        default = the current backend only.
      precompile: ALSO embed the fully-compiled XLA executable for the
        CURRENT backend (device-fingerprint-keyed). A deployment host with
        the same platform/device-kind/jax version then skips XLA
        compilation entirely on first load — the StableHLO blob remains the
        portable fallback for every other host.

    Returns the artifact's metadata dict.
    """
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from jax import export as jax_export

    graphdef, state = synth._graphdef, synth._state
    steps = synth.config.steps
    extra = dict(synth.config.extra_controls)
    has_vocoder = synth.vocoder is not None
    if has_vocoder:
        voc_graphdef, _ = nnx.split(synth.vocoder)
        voc_state = synth._voc_state

    def fn(tokens, lens, seed, duration_factor, pitch_factor, pitch_delta,
           energy_factor, energy_delta, speaker):
        m = nnx.merge(graphdef, state)
        mel, ad = m.infer(
            tokens, text_lengths=lens, max_dec_len=frame_budget,
            steps=steps, key=jax.random.PRNGKey(seed),
            duration_factor=duration_factor, pitch_factor=pitch_factor,
            pitch_delta=pitch_delta, energy_factor=energy_factor,
            energy_delta=energy_delta,
            speaker=speaker if use_speaker else None, **extra)
        if has_vocoder:
            voc = nnx.merge(voc_graphdef, voc_state)
            # same float32 [-1, 1] contract as Synthesizer.synthesize_audio:
            # GAN vocoders can peak past 1.0, which would wrap int16 encoders
            return jnp.clip(voc.infer(mel), -1.0, 1.0), ad.dec_lengths
        return mel, ad.dec_lengths

    f32 = jnp.float32
    args = (
        jax.ShapeDtypeStruct((batch, text_bucket), jnp.int32),  # tokens
        jax.ShapeDtypeStruct((batch,), jnp.int32),              # lens
        jax.ShapeDtypeStruct((), jnp.uint32),                   # seed
        jax.ShapeDtypeStruct((), f32), jax.ShapeDtypeStruct((), f32),
        jax.ShapeDtypeStruct((), f32), jax.ShapeDtypeStruct((), f32),
        jax.ShapeDtypeStruct((), f32),                          # controls
        jax.ShapeDtypeStruct((batch,), jnp.int32),              # speaker
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(fn), **kwargs)(*args)
    blob = exported.serialize()

    exec_blob = exec_fp = None
    if precompile and jax.default_backend() == "cpu":
        logger.warning(
            "--precompile on a CPU host: loaders ignore CPU executables "
            "unless ISP_TTS_TPU_FORCE_EXEC=1 (XLA:CPU AOT loading is "
            "machine-feature-fragile) — the embedded blob is dead weight "
            "for most deployments")
    if precompile:
        # compile NOW for the current backend and ship the executable too:
        # the matching deployment host pays zero compile time on first load
        # (the round-3 artifact's ~354 s cold start, docs/PERF_R3.md)
        try:
            import pickle

            from jax.experimental import serialize_executable

            compiled = jax.jit(fn).lower(*args).compile()
            payload, in_tree, out_tree = serialize_executable.serialize(compiled)
            exec_blob = pickle.dumps((payload, in_tree, out_tree))
            exec_fp = _device_fingerprint()
            logger.info("embedded %s executable (%.1f MB) for %s",
                        exec_fp["platform"], len(exec_blob) / 1e6,
                        exec_fp["device_kind"])
        except Exception as e:  # noqa: BLE001 — optimization only
            logger.warning("precompile requested but executable "
                           "serialization failed (%s); artifact remains "
                           "StableHLO-only", e)
            exec_blob = exec_fp = None

    geo = synth._audio_geometry()
    if has_vocoder:
        fc = synth.vocoder.features_config
        hop, sr = int(fc.hop_length), int(fc.sample_rate)
    else:
        hop, sr = int(geo["hop_length"]), int(geo["sample_rate"])
    meta = {
        "format_version": FORMAT_VERSION,
        "output": "audio" if has_vocoder else "mel",
        "text_bucket": text_bucket,
        "frame_budget": frame_budget,
        "batch": batch,
        "use_speaker": use_speaker,
        "steps": steps,
        "platforms": list(exported.platforms),
        "encoding_map": dict(synth.text_provider.coding_table.encoding_map),
        # the text pipeline travels with the artifact: a phoneme-charset
        # model tokenized without its phonemizer would silently drop every
        # grapheme (unknown chars warn, not raise) and produce garbage audio
        "phonemizer": bool(synth.config.phonemizer),
        "language": synth.config.language,
        "hop_length": hop,
        "sample_rate": sr,
        "mel_dim": int(synth.model.mel_dim),
    }
    if exec_fp is not None:
        meta["precompiled"] = exec_fp
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta))
        z.writestr(_FN_NAME, blob)
        if exec_blob is not None:
            z.writestr(_EXEC_NAME, exec_blob)
    return meta


class ExportedSynthesizer:
    """Serve text from an exported artifact — no model code, no checkpoint.

    >>> ex = ExportedSynthesizer("serving.tts.zip")
    >>> wav_or_mel = ex("hello world.")[0]

    Only the exported (text_bucket, frame_budget, batch) shape exists:
    longer inputs raise. Tokenization uses the coding table embedded in the
    artifact (cleaners only; the phonemizer is a training-host concern).
    """

    def __init__(self, path):
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read(_META_NAME))
            blob = z.read(_FN_NAME)
            exec_blob = (z.read(_EXEC_NAME)
                         if _EXEC_NAME in z.namelist() else None)
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact version {self.meta.get('format_version')}")
        # persistent compile cache: even without an embedded executable, the
        # SECOND cold load of the same artifact on this host skips the XLA
        # compile (keyed on the StableHLO, so it self-invalidates)
        from .utils.compile_cache import enable_compile_cache

        enable_compile_cache()

        import os

        import jax

        # XLA:CPU AOT executables are machine-feature-fragile when loaded
        # in-process (observed symbol-lookup failures) — CPU hosts use the
        # StableHLO + persistent-cache path unless ISP_TTS_TPU_FORCE_EXEC=1.
        # Accelerators load the embedded executable (measured on the v5e:
        # 27 s first load vs 277 s StableHLO cold compile, bit-identical
        # outputs — docs/PERF_R4.md).
        platform = getattr(jax.devices()[0], "platform", jax_default_backend())
        allow_exec = (platform != "cpu"
                      or os.environ.get("ISP_TTS_TPU_FORCE_EXEC") == "1")
        self._loaded = None
        if exec_blob is not None and allow_exec and self._fingerprint_matches():
            # embedded pre-compiled executable: zero compile on first load.
            # NOTE: loading it unpickles executable metadata — an artifact
            # is already trusted code-equivalent (it IS the program you are
            # about to run), same trust boundary as the StableHLO blob.
            try:
                import pickle

                from jax.experimental import serialize_executable

                import jax

                payload, in_tree, out_tree = pickle.loads(exec_blob)
                # serving artifacts are single-device programs: load onto
                # one device (default would spread over every local device)
                self._loaded = serialize_executable.deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=jax.devices()[:1])
                logger.info("artifact: using embedded pre-compiled "
                            "executable (no XLA compile)")
            except Exception as e:  # noqa: BLE001 — fall back to StableHLO
                logger.warning("embedded executable unusable (%s); falling "
                               "back to StableHLO compile", e)
                self._loaded = None
        from jax import export as jax_export

        self._fn = jax_export.deserialize(blob) if self._loaded is None else None
        from .data.text.processor import TextProcessor
        from .data.text.table import CodingTable

        self._table = CodingTable.from_encoding_map(self.meta["encoding_map"])
        self._call = (self._loaded if self._loaded is not None
                      else self._fn.call)
        # reconstruct the source synthesizer's text pipeline — if the
        # artifact needs espeak and this host lacks it, fail HERE, loudly
        self._process = TextProcessor(
            phonemizer=self.meta.get("phonemizer", False),
            language=self.meta.get("language", "en-us"))

    def _fingerprint_matches(self) -> bool:
        want = self.meta.get("precompiled")
        if not want:
            return False
        have = _device_fingerprint()
        if have != want:
            logger.info("artifact precompiled for %s, host is %s — using "
                        "the portable StableHLO path", want, have)
            return False
        return True

    def __call__(self, text: str | list[str], seed: int = 0,
                 duration_factor: float = 1.0, pitch_factor: float = 1.0,
                 pitch_delta: float = 0.0, energy_factor: float = 1.0,
                 energy_delta: float = 0.0,
                 speaker: int | list[int] | None = None) -> list[np.ndarray]:
        meta = self.meta
        texts = [text] if isinstance(text, str) else list(text)
        B, Tb = meta["batch"], meta["text_bucket"]
        if len(texts) > B:
            raise ValueError(f"artifact was exported for batch {B}, "
                             f"got {len(texts)} texts")
        if speaker is not None and not meta["use_speaker"]:
            raise ValueError("artifact was exported without speaker support")
        tokens = np.zeros((B, Tb), np.int32)
        lens = np.ones((B,), np.int32)
        for i, t in enumerate(texts):
            # same pipeline as TextProvider: clean -> lowercase -> EOS -> ids
            processed = self._table.check_eos(self._process(t))
            vec = np.asarray(self._table.text_to_vector(processed), np.int32)
            if len(vec) > Tb:
                raise ValueError(f"text of {len(vec)} tokens exceeds the "
                                 f"exported bucket {Tb}")
            tokens[i, : len(vec)] = vec
            lens[i] = len(vec)
        spk = np.zeros((B,), np.int32)
        if speaker is not None:
            ids = [speaker] * len(texts) if np.isscalar(speaker) else list(speaker)
            if len(ids) != len(texts):
                raise ValueError(
                    f"speaker list length {len(ids)} != number of texts "
                    f"{len(texts)}")
            spk[: len(ids)] = ids
        out, dec_lens = self._call(
            tokens, lens, np.uint32(seed), np.float32(duration_factor),
            np.float32(pitch_factor), np.float32(pitch_delta),
            np.float32(energy_factor), np.float32(energy_delta), spk)
        out, dec_lens = np.asarray(out), np.asarray(dec_lens)
        if any(int(dec_lens[i]) >= meta["frame_budget"]
               for i in range(len(texts))):
            # a single-shape artifact cannot rebucket like the live
            # Synthesizer — surface the clip instead of losing tail frames
            # silently (export with a larger --frame-budget to fix)
            logger.warning(
                "exported frame budget %d saturated (dec_lens=%s); tail "
                "frames may be clipped", meta["frame_budget"],
                dec_lens[: len(texts)])
        n = meta["hop_length"] if meta["output"] == "audio" else 1
        return [out[i, : int(dec_lens[i]) * n] if meta["output"] == "audio"
                else out[i, : int(dec_lens[i])] for i in range(len(texts))]


def main(argv=None) -> None:
    """``python -m isp_tts_tpu.export --checkpoint m.ckpt --output a.zip``"""
    import argparse
    import logging

    from .serving import Synthesizer, SynthesizerConfig

    p = argparse.ArgumentParser(description="AOT serving export")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--vocoder", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--text-bucket", type=int, default=128)
    p.add_argument("--frame-budget", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--speaker", action="store_true",
                   help="export the speaker-control variant")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="e.g. --platforms cpu tpu for a dual artifact")
    p.add_argument("--precompile", action="store_true",
                   help="also embed the compiled XLA executable for THIS "
                        "host (fingerprint-keyed; kills the cold-start "
                        "compile on matching deployment hosts)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    synth = Synthesizer.from_pretrained(
        args.checkpoint, SynthesizerConfig(steps=args.steps),
        vocoder_path=args.vocoder)
    meta = export_serving(
        synth, args.output, text_bucket=args.text_bucket,
        frame_budget=args.frame_budget, batch=args.batch,
        use_speaker=args.speaker,
        platforms=tuple(args.platforms) if args.platforms else None,
        precompile=args.precompile)
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
