"""Self-describing single-file checkpoints (msgpack) + torch `.pt` interop.

Format parity with the reference (`tts/experiments/trainer.py:357-386`,
`tts/models/base.py:38-56`): one file containing the experiment config,
trainer state, model config + weights, and optimizer state — the embedded
model config makes checkpoints self-describing, so ``from_pretrained``
rebuilds the model with no external config.

Files: ``checkpoint_{sN|eN}.ckpt``, ``checkpoint_last.ckpt``,
``checkpoint_best.ckpt`` (reference names with ``.pt`` -> ``.ckpt``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import numpy as np
from flax import serialization

logger = logging.getLogger("isp_tts_tpu")


def _to_serializable(obj: Any) -> Any:
    """Make a pytree msgpack-friendly: jax arrays -> numpy, tuples -> lists,
    nnx State/Variable containers -> plain nested dicts/arrays."""
    import jax

    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, np.ndarray):
        return obj
    if isinstance(obj, np.generic):
        return obj.item()
    if hasattr(obj, "items"):  # dict, nnx.State, FrozenDict, ...
        return {str(k): _to_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_serializable(v) for v in obj]
    if hasattr(obj, "value"):  # nnx.Variable and friends
        return _to_serializable(obj.value)
    return obj


def save_checkpoint(path: str | Path, payload: dict) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = serialization.msgpack_serialize(_to_serializable(payload))
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)  # atomic on POSIX


def load_checkpoint(path: str | Path) -> dict:
    path = Path(path)
    if path.suffix == ".pt":  # reference torch checkpoint
        return load_torch_checkpoint(path)
    return serialization.msgpack_restore(path.read_bytes())


# ---------------------------------------------------------------------------
# torch .pt interop
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str | Path) -> dict:
    """Read a reference torch checkpoint and convert it to our layout.

    Returns {"model": {"config": ..., "state": {flat torch names: np arrays}}}
    with torch parameter names; use
    :func:`isp_tts_tpu.models.acoustic.interop.convert_torch_state` to map
    names/layouts onto the JAX model tree.
    """
    import torch

    try:
        # tensors + plain containers (our own exported .pt files): safe mode
        ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints pickle an OmegaConf config object alongside
        # the tensors (reference base.py:44 loads the same way) — full
        # unpickling executes code from the file, so say so
        logger.warning(
            "%s is not loadable in safe mode (weights_only); falling back "
            "to full unpickling — only do this with checkpoints you trust",
            path)
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    model_blob = ckpt.get("model", ckpt)
    state_dict = model_blob.get("state_dict", model_blob)
    state = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
             for k, v in state_dict.items()}
    config = model_blob.get("config", {})
    if hasattr(config, "items") and not isinstance(config, dict):
        config = {k: config[k] for k in config}  # OmegaConf-like containers
    return {"format": "torch", "model": {"config": _plain(config), "state": state}}


def _plain(obj: Any) -> Any:
    if hasattr(obj, "items"):
        return {str(k): _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def save_torch_checkpoint(model, path: str | Path) -> None:
    """Write this model as a REFERENCE-format torch ``.pt`` checkpoint
    (`base.py:38-56` container: ``{"model": {"config", "state_dict"}}``),
    loadable by the reference's ``AcousticModel.from_pretrained`` — the
    inverse of :func:`load_torch_checkpoint`, so users can move checkpoints
    in both directions (train here, serve there, or vice versa)."""
    import torch

    from ..config.registry import config_to_dict
    from ..models.acoustic.interop import export_torch_config, export_torch_state

    temb = getattr(getattr(getattr(model, "temporal_adaptor", None),
                           "predictor", None), "time_embedding", None)
    freq_scale = float(temb.freq_scale) if temb is not None else None
    tstate = export_torch_state(model.state_dict(), freq_scale)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in tstate.items()}
    config = export_torch_config(config_to_dict(model.config))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"model": {"config": config, "state_dict": tensors}}, str(path))
