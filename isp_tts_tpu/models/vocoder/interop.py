"""Torch Vocos checkpoint interop: load the reference's actual external
vocoder artifact as a TPU-native :class:`VocoderModel`.

The reference's only vocoder is the pre-trained TorchScript file
``vocos_ms_fp16.pts`` (`/root/reference/notebooks/inference.ipynb` cells 6-7:
``torch.jit.load`` -> ``vocoder.infer(mel.half())``, 13.45M params). Its
architecture is the official Vocos mel model (ConvNeXt backbone + ISTFT
head), which :class:`VocosGenerator` re-implements TPU-first — so the
weights map 1:1 and the artifact can run through the matmul-iSTFT path on
the TPU instead of through host-side torch.

Supported inputs:
- TorchScript files (``.pts``/``.pt`` via ``torch.jit.load``) — the
  reference's format;
- plain state dicts / ``pytorch_model.bin`` (the official
  ``charactr/vocos-mel-24khz`` HF layout), optionally nested under a
  ``state_dict`` key or an arbitrary single wrapper prefix.

Layout rules (official Vocos names -> ours):
- ``backbone.embed``            Conv1d (out, in, k) -> ``generator.embed``   (k, in, out)
- ``backbone.norm``             -> ``generator.norm_pre``   (weight -> scale)
- ``backbone.convnext.{i}.*``   -> ``generator.blocks.{i}.*`` (dwconv/norm/
  pwconv1/pwconv2/gamma; Linear weights transposed)
- ``backbone.final_layer_norm`` -> ``generator.norm_post``
- ``head.out``                  -> ``generator.head``
- ``feature_extractor.*`` and ISTFT window buffers are dropped (we
  regenerate them; the mel front-end lives in ``features_config``).

Two architectural deltas are pinned via the generator config so loaded
weights reproduce torch numerics: ``gelu="exact"`` (torch ``nn.GELU()`` is
erf-based; our training default is the tanh approximation) and
``min_log_mag=None`` + ``max_log_mag=log(100)`` (official Vocos clips the
magnitude only from above, at 1e2). Parity is tested against an
independent torch implementation in ``tests/test_vocoder_interop.py``.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path

import numpy as np

logger = logging.getLogger("isp_tts_tpu")

# substring rewrites applied in order (official vocos names -> ours)
_NAME_RULES: list[tuple[str, str]] = [
    (r"^backbone\.embed\.", "generator.embed."),
    (r"^backbone\.norm\.", "generator.norm_pre."),
    (r"^backbone\.convnext\.(\d+)\.", r"generator.blocks.\1."),
    (r"^backbone\.final_layer_norm\.", "generator.norm_post."),
    (r"^head\.out\.", "generator.head."),
]

#: buffers we regenerate on our side (mel filterbanks, ISTFT windows)
_DROP = re.compile(r"^(feature_extractor\.|head\.istft\.)")


def _strip_wrapper_prefix(state: dict) -> dict:
    """TorchScript exports sometimes nest the model under one attribute
    (e.g. ``model.backbone...``); strip a single shared wrapper prefix when
    no key starts with a recognized root."""
    roots = ("backbone.", "head.", "feature_extractor.")
    if any(k.startswith(roots) for k in state):
        return state
    prefixes = {k.split(".", 1)[0] for k in state if "." in k}
    if len(prefixes) == 1:
        p = next(iter(prefixes)) + "."
        inner = {k[len(p):]: v for k, v in state.items() if k.startswith(p)}
        if any(k.startswith(roots) for k in inner):
            return inner
    return state


def convert_vocos_state(torch_state: dict) -> dict[str, np.ndarray]:
    """{official vocos name: tensor/array} -> {our dotted name: np.float32}.

    Unrecognized keys are dropped with a warning; ``load_torch_vocoder``
    then enforces exact generator coverage, so a non-vocos checkpoint
    raises rather than half-loading.
    """
    torch_state = _strip_wrapper_prefix(
        {str(k): v for k, v in torch_state.items()})
    out: dict[str, np.ndarray] = {}
    for name, value in torch_state.items():
        if _DROP.match(name):
            continue
        new = name
        matched = False
        for pattern, repl in _NAME_RULES:
            new2 = re.sub(pattern, repl, new)
            if new2 != new:
                new, matched = new2, True
                break
        if not matched:
            logger.warning("convert_vocos_state: unrecognized key %s", name)
            continue
        value = np.asarray(_to_numpy(value), dtype=np.float32)

        if new.endswith(".weight"):
            base = new[: -len(".weight")]
            if value.ndim == 3:  # Conv1d (out, in, k) -> (k, in, out)
                new, value = base + ".kernel", value.transpose(2, 1, 0)
            elif value.ndim == 2:  # Linear (out, in) -> (in, out)
                new, value = base + ".kernel", value.T
            else:  # LayerNorm weight -> scale
                new = base + ".scale"
        out[new] = value
    return out


def _to_numpy(value):
    if hasattr(value, "detach"):  # torch tensor (possibly fp16)
        return value.detach().to("cpu").float().numpy()
    return value


def infer_generator_config(flat: dict[str, np.ndarray], hop_length: int) -> dict:
    """Derive the VocosGeneratorConfig fields from converted weight shapes."""
    embed = flat["generator.embed.kernel"]  # (k, n_mels, dim)
    head = flat["generator.head.kernel"]  # (dim, n_fft + 2)
    pw1 = flat["generator.blocks.0.pwconv1.kernel"]  # (dim, intermediate)
    num_layers = 1 + max(
        int(m.group(1)) for k in flat
        if (m := re.match(r"generator\.blocks\.(\d+)\.", k)))
    return {
        "n_mels": int(embed.shape[1]),
        "dim": int(embed.shape[2]),
        "intermediate_dim": int(pw1.shape[1]),
        "num_layers": num_layers,
        "n_fft": int(head.shape[1]) - 2,
        "hop_length": hop_length,
        # official Vocos semantics: exact-erf GELU, upper-only magnitude
        # clip at 1e2 (see module docstring)
        "gelu": "exact",
        "max_log_mag": float(np.log(100.0)),
        "min_log_mag": None,
    }


# inverse substring rewrites for export (our names -> official vocos)
_EXPORT_NAME_RULES: list[tuple[str, str]] = [
    (r"^generator\.embed\.", "backbone.embed."),
    (r"^generator\.norm_pre\.", "backbone.norm."),
    (r"^generator\.blocks\.(\d+)\.", r"backbone.convnext.\1."),
    (r"^generator\.norm_post\.", "backbone.final_layer_norm."),
    (r"^generator\.head\.", "head.out."),
]


def export_vocos_state(state: dict) -> dict[str, np.ndarray]:
    """{our dotted name: array} -> {official vocos name: np.float32}.

    Inverse of :func:`convert_vocos_state`: restores the official parameter
    names and torch layouts (Conv1d ``(out, in, k)``, Linear ``(out, in)``,
    LayerNorm ``weight``) so a generator trained here loads into any torch
    Vocos implementation — including the reference's serving stack built
    around ``vocos_ms_fp16.pts`` (`/root/reference/notebooks/inference.ipynb`
    cells 6-7). Discriminator/feature tensors have no counterpart in the
    official generator checkpoints and are skipped.
    """
    out: dict[str, np.ndarray] = {}
    for name, value in state.items():
        new = None
        for pattern, repl in _EXPORT_NAME_RULES:
            new2 = re.sub(pattern, repl, name)
            if new2 != name:
                new = new2
                break
        if new is None:
            continue  # discriminator.* etc.: not part of a vocos checkpoint
        value = np.asarray(_to_numpy(value), dtype=np.float32)
        if new.endswith(".kernel"):
            base = new[: -len(".kernel")]
            if value.ndim == 3:  # Conv1d (k, in, out) -> torch (out, in, k)
                new, value = base + ".weight", value.transpose(2, 1, 0)
            else:  # Linear (in, out) -> torch (out, in)
                new, value = base + ".weight", value.T
        elif new.endswith(".scale"):  # LayerNorm scale -> weight
            new = new[: -len(".scale")] + ".weight"
        out[new] = value
    return out


def save_torch_vocoder(model, path: str | Path, fp16: bool = False) -> None:
    """Write this :class:`VocoderModel`'s generator as a torch Vocos state
    dict (official ``charactr/vocos`` parameter layout) so reference users
    can serve a TPU-trained vocoder from their existing torch stack — the
    inverse of :func:`load_torch_vocoder`. ``fp16`` halves the tensors the
    way the reference's own ``vocos_ms_fp16.pts`` artifact does.

    Warns when the generator's activation/clip semantics deviate from the
    official torch implementation (erf GELU, upper-only magnitude clip at
    1e2): the weights still load, but a torch server will run the official
    math, not ours.
    """
    import torch

    gen_cfg = model.generator.config
    if gen_cfg.gelu == "tanh":
        logger.warning(
            "save_torch_vocoder: generator uses tanh GELU; official torch "
            "Vocos applies exact-erf GELU to these weights")
    if gen_cfg.min_log_mag is not None or not np.isclose(
            gen_cfg.max_log_mag, np.log(100.0)):
        logger.warning(
            "save_torch_vocoder: generator clips log-magnitude to [%s, %s]; "
            "official torch Vocos clips only from above at log(100)",
            gen_cfg.min_log_mag, gen_cfg.max_log_mag)
    flat = export_vocos_state(model.state_dict())
    # np.array(copy=True): torch.from_numpy rejects read-only views and
    # transpose() above yields non-contiguous ones.
    tensors = {k: torch.from_numpy(np.array(v)) for k, v in flat.items()}
    if fp16:
        tensors = {k: v.half() for k, v in tensors.items()}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(tensors, str(path))
    logger.info("saved torch Vocos state dict to %s (%d tensors%s)",
                path, len(tensors), ", fp16" if fp16 else "")


def load_torch_vocoder(path: str | Path, hop_length: int = 256,
                       sample_rate: int = 22050,
                       f_min: float = 0.0, f_max: float | None = 8000.0,
                       rngs=None):
    """Load a torch Vocos checkpoint (TorchScript ``.pts`` or state dict)
    into a :class:`VocoderModel` running on the TPU compute path.

    ``hop_length``/``sample_rate``/``f_min``/``f_max`` are not recoverable
    from the weights; the defaults are the reference's mel contract
    (22.05 kHz, hop 256 — `/root/reference/configs/data/*.yaml`).

    Raises ``ValueError`` unless the converted weights cover EVERY generator
    tensor — a Vocos-variant checkpoint must fail here, not ship a model
    with random-init layers.
    """
    import torch

    from flax import nnx

    from .model import VocoderModel, VocoderModelConfig
    from ...config.registry import build_config

    p = Path(path)
    state = None
    try:
        module = torch.jit.load(str(p), map_location="cpu")
        state = dict(module.state_dict())
    except Exception:
        # weights_only=True covers every supported non-TorchScript format
        # (plain state dicts, {"state_dict": ...} wrappers). Never fall back
        # to a full unpickle: that executes arbitrary code from a
        # user-supplied file for a case (pickled nn.Module) we don't support
        # anyway.
        try:
            obj = torch.load(str(p), map_location="cpu", weights_only=True)
        except Exception as e:
            raise ValueError(
                f"{p}: neither TorchScript nor a plain tensor state dict "
                f"({e}). Pickled torch modules are not loaded (arbitrary "
                f"code execution); save the module's .state_dict() instead.")
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        if not isinstance(obj, dict):
            raise ValueError(f"{p}: not a torch module or state dict")
        state = obj

    flat = convert_vocos_state(state)
    if "generator.embed.kernel" not in flat:
        raise ValueError(
            f"{p}: no Vocos backbone found (keys: {sorted(state)[:5]}...)")
    gen_cfg = infer_generator_config(flat, hop_length)
    config = build_config(VocoderModelConfig, {
        "generator": gen_cfg,
        "features": {
            "sample_rate": sample_rate,
            "n_fft": gen_cfg["n_fft"],
            "hop_length": hop_length,
            "win_length": gen_cfg["n_fft"],
            "n_mels": gen_cfg["n_mels"],
            "f_min": f_min,
            "f_max": f_max,
        },
    })
    model = VocoderModel(config, rngs=rngs or nnx.Rngs(0))
    # every generator tensor must come from the checkpoint: a partially
    # matching (Vocos-variant) file would otherwise keep random-init layers
    # and "succeed" into producing noise
    want = {k for k in model.state_dict() if k.startswith("generator.")}
    missing = want - set(flat)
    extra = set(flat) - want
    if missing or extra:
        raise ValueError(
            f"{p}: not an exact Vocos generator layout — "
            f"missing {sorted(missing)[:4]}{'...' if len(missing) > 4 else ''}, "
            f"unmapped {sorted(extra)[:4]}{'...' if len(extra) > 4 else ''}")
    model.load_params(flat)
    logger.info("loaded torch Vocos vocoder from %s: %d tensors, dim=%d, "
                "layers=%d, n_fft=%d", p, len(flat), gen_cfg["dim"],
                gen_cfg["num_layers"], gen_cfg["n_fft"])
    return model
