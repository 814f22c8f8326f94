"""Synthesis CLI — the notebook-equivalent inference entry point.

Parity with `notebooks/inference.ipynb`: checkpoint -> text front-end ->
``model.infer`` (duration/pitch/energy controls) -> vocoder -> wav. The
built-in vocoder is jittable Griffin-Lim; a neural vocoder is plugged via
``--vocoder`` — an in-repo VocoderModel ``.ckpt`` or the reference's torch
Vocos artifact (``.pts``/``.pt``/``.bin``, converted on load and run on the
accelerator — see models/vocoder/interop.py).

    python -m isp_tts_tpu.synthesize --checkpoint ckpt.ckpt \
        --text "Hello world." --output out.wav [--steps 4]
        [--duration-factor 1.0] [--pitch-factor 1.0] [--pitch-delta 0.0]
        [--speaker 0] [--seed 0]
"""

from __future__ import annotations

import argparse
import logging
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="isp_tts_tpu synthesis")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--text", required=True)
    parser.add_argument("--output", default="output.wav")
    parser.add_argument("--charset", nargs="+",
                        default=["<pad>", "</s>", "#punct", "#en"])
    parser.add_argument("--phonemizer", action="store_true")
    parser.add_argument("--language", default="en-us")
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--duration-factor", type=float, default=1.0)
    parser.add_argument("--pitch-factor", type=float, default=1.0)
    parser.add_argument("--pitch-delta", type=float, default=0.0)
    parser.add_argument("--energy-factor", type=float, default=1.0)
    parser.add_argument("--speaker", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=2048)
    parser.add_argument("--sample-rate", type=int, default=22050)
    parser.add_argument("--vocoder", default=None,
                        help="neural vocoder: an isp_tts_tpu VocoderModel "
                             "checkpoint (.ckpt) or a torch Vocos checkpoint "
                             "(.pts/.pt/.bin) (default: Griffin-Lim)")
    parser.add_argument("--griffin-lim-iters", type=int, default=48)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    log = logging.getLogger("synthesize")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data.audio import write_wav
    from .data.providers import TextProvider, TextProviderConfig
    from .models import AcousticModel

    model = AcousticModel.from_pretrained(args.checkpoint)
    model.eval()

    provider = TextProvider(TextProviderConfig(
        charset=list(args.charset), phonemizer=args.phonemizer,
        language=args.language))
    data = provider(args.text)
    log.info("text -> %d tokens", data.vector_len)

    tokens = jnp.asarray(data.vector, jnp.int32)[None]
    speaker = (jnp.asarray([args.speaker], jnp.int32)
               if args.speaker is not None else None)
    t0 = time.perf_counter()
    mel, adaptor = model.infer(
        tokens,
        max_dec_len=args.max_frames,
        steps=args.steps,
        duration_factor=args.duration_factor,
        pitch_factor=args.pitch_factor,
        pitch_delta=args.pitch_delta,
        energy_factor=args.energy_factor,
        speaker=speaker,
        key=jax.random.PRNGKey(args.seed),
    )
    n_frames = int(adaptor.dec_lengths[0])
    if n_frames < 1:
        # every predicted duration rounded to zero (untrained/degenerate
        # model); keep one frame so the vocoder has something to invert
        log.warning("model predicted 0 frames; emitting 1 frame of silence")
        n_frames = 1
    mel = mel[:, :n_frames]
    log.info("acoustic: %d frames in %.3fs", n_frames, time.perf_counter() - t0)

    t0 = time.perf_counter()
    if args.vocoder:
        # neural vocoder: an in-repo VocoderModel .ckpt, or a torch Vocos
        # checkpoint (.pts/.pt/.bin — the reference's artifact) converted
        # through models.vocoder.interop. Either way the generator runs on
        # the accelerator; torch is only used (read-only) to decode weights.
        from .models import VocoderModel

        vocoder = VocoderModel.from_pretrained(args.vocoder)
        vocoder.eval()
        audio = np.clip(np.asarray(vocoder.infer(mel))[0], -1.0, 1.0)
    else:
        from .ops.vocoder import mel_to_audio

        # Griffin-Lim uses complex FFT phase math; run it on the CPU backend
        # (some TPU runtimes lack complex support, and vocoding-at-the-edge is
        # a host-side utility — neural vocoders slot in via --vocoder)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            audio = np.asarray(mel_to_audio(
                jnp.asarray(np.asarray(mel[0])), sample_rate=args.sample_rate,
                n_iter=args.griffin_lim_iters))
        audio = np.nan_to_num(audio)  # degenerate mels (e.g. 1 silent frame)
        audio = np.clip(audio / max(np.abs(audio).max(), 1e-6) * 0.95, -1, 1)
    log.info("vocoder: %.2fs of audio in %.3fs",
             len(audio) / args.sample_rate, time.perf_counter() - t0)

    write_wav(args.output, audio.astype(np.float32), args.sample_rate)
    log.info("wrote %s", args.output)


if __name__ == "__main__":
    main()
