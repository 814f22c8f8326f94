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

logger = logging.getLogger("isp_tts_tpu")

_META_NAME = "meta.json"
_FN_NAME = "fn.jaxexport"
FORMAT_VERSION = 1


def export_serving(synth, path, text_bucket: int, frame_budget: int,
                   batch: int = 1, use_speaker: bool = False,
                   platforms: tuple | None = None) -> dict:
    """Export one (text_bucket, frame_budget, batch) serving executable.

    Args:
      synth: a ``serving.Synthesizer`` (with or without a neural vocoder).
      path: output artifact path (zip).
      platforms: e.g. ``("cpu", "tpu")`` for a multi-platform artifact;
        default = the current backend only.

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
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta))
        z.writestr(_FN_NAME, blob)
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
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact version {self.meta.get('format_version')}")
        from jax import export as jax_export

        self._fn = jax_export.deserialize(blob)
        from .data.text.processor import TextProcessor
        from .data.text.table import CodingTable

        self._table = CodingTable.from_encoding_map(self.meta["encoding_map"])
        # reconstruct the source synthesizer's text pipeline — if the
        # artifact needs espeak and this host lacks it, fail HERE, loudly
        self._process = TextProcessor(
            phonemizer=self.meta.get("phonemizer", False),
            language=self.meta.get("language", "en-us"))

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
        out, dec_lens = self._fn.call(
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
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    synth = Synthesizer.from_pretrained(
        args.checkpoint, SynthesizerConfig(steps=args.steps),
        vocoder_path=args.vocoder)
    meta = export_serving(
        synth, args.output, text_bucket=args.text_bucket,
        frame_budget=args.frame_budget, batch=args.batch,
        use_speaker=args.speaker,
        platforms=tuple(args.platforms) if args.platforms else None)
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
