"""Model base class: self-describing checkpoints, partial loading, freezing.

Capability parity with reference `tts/models/base.py:16-115`:
- ``from_pretrained(path)``: checkpoint embeds the model config, so the model
  is rebuilt with no external config, missing keys backfilled from a fresh
  init, then weights loaded (:38-56)
- ``load_params`` with ``ignore_layers`` substring matching + auto-skip of
  shape-mismatched tensors (:76-115)
- ``freeze(exception_list)``: prefix-matched trainability control (:66-73) —
  in JAX this records frozen path prefixes which the trainer turns into an
  optax mask (functional equivalent of requires_grad=False)
- ``inject_data_config`` / ``cleanup_config`` hooks (:25-36)

Checkpoint format: single msgpack file {"format", "model": {"class",
"config", "state"}} — see isp_tts_tpu/training/checkpoint.py.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import nnx

logger = logging.getLogger("isp_tts_tpu")


def flatten_state(state: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten an nnx state / nested dict into {'a.b.c': array}."""
    flat: dict[str, np.ndarray] = {}
    if hasattr(state, "items"):
        items = state.items()
    else:
        return {prefix.rstrip("."): state}
    for key, value in items:
        name = f"{prefix}{key}"
        if hasattr(value, "items"):
            flat.update(flatten_state(value, name + "."))
        else:
            flat[name] = value
    return flat


def unflatten_state(flat: dict[str, Any]) -> dict:
    nested: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return nested


class Model(nnx.Module):
    """Base for all models. Subclasses define ``Config`` and ``__call__``."""

    Config: type = None  # type: ignore

    def __init__(self):
        self.frozen_prefixes: list[str] = []

    # -- config hooks -------------------------------------------------------

    @staticmethod
    def inject_data_config(config: dict, dataset) -> dict:
        """Copy dataset-derived fields (vocab, stats) into the model config."""
        return config

    # -- freezing ------------------------------------------------------------

    def freeze(self, exception_list: list[str] | None = None) -> None:
        """Freeze all parameters except those whose path starts with an entry
        of ``exception_list`` (empty list = train everything)."""
        if exception_list is None:
            exception_list = []
        if len(exception_list) == 0:
            self.frozen_prefixes = []
        else:
            self.frozen_prefixes = ["*"] + [str(p) for p in exception_list]

    def is_trainable(self, path: str) -> bool:
        """Prefix-matched, like the reference (base.py:70) — substring
        matching would over-unfreeze (e.g. 'embedding' hitting
        'temporal_adaptor.embedding')."""
        if not self.frozen_prefixes:
            return True
        exceptions = self.frozen_prefixes[1:]
        return any(path.startswith(e) for e in exceptions)

    # -- state io ------------------------------------------------------------

    def state_dict(self) -> dict[str, np.ndarray]:
        from ..parallel.mesh import gather_to_host

        state = nnx.state(self, nnx.Not(nnx.RngState))
        # gather_to_host allgathers any cross-host-sharded leaf (TP over
        # multi-host meshes) — a bare np.asarray raises on those
        return {k: gather_to_host(v)
                for k, v in flatten_state(_pure(state)).items()}

    def load_params(self, flat: dict[str, Any], ignore_layers: list[str] | None = None,
                    ignore_mismatched: bool = True) -> None:
        """Load a flat {path: array} dict into this model.

        - keys containing any ``ignore_layers`` substring are skipped
        - shape-mismatched tensors are skipped with a warning when
          ``ignore_mismatched``
        - missing keys keep their fresh-init values
        - per-layer transformer checkpoints load into stacked (``pipeline:
          true``) models and vice versa (``_translate_layer_stacking``)
        """
        current = self.state_dict()
        flat = _translate_layer_stacking(flat, current)
        accepted: dict[str, Any] = {}
        for key, value in flat.items():
            if ignore_layers and any(il in key for il in ignore_layers):
                logger.info("load_params: ignoring %s (ignore_layers)", key)
                continue
            if key not in current:
                logger.warning("load_params: unexpected key %s", key)
                continue
            if tuple(np.shape(value)) != tuple(current[key].shape):
                if ignore_mismatched:
                    logger.warning(
                        "load_params: shape mismatch for %s: ckpt %s vs model %s — skipped",
                        key, np.shape(value), current[key].shape)
                    continue
                raise ValueError(f"shape mismatch for {key}")
            accepted[key] = value
        missing = set(current) - set(accepted)
        if missing and len(accepted) < len(current):
            logger.info("load_params: %d keys kept at init values", len(missing))

        merged = dict(current)
        merged.update(accepted)
        state = nnx.state(self, nnx.Not(nnx.RngState))
        _update_from_flat(state, merged)
        nnx.update(self, state)

    # -- pretrained ----------------------------------------------------------

    @classmethod
    def convert_torch_checkpoint(cls, config: dict, state: dict) -> tuple[dict, dict]:
        """Map a reference torch checkpoint's (config, flat state) onto this
        model class's schema/parameter tree. Subclasses with a torch interop
        story override this; the base refuses rather than silently building a
        fresh-init model from unconverted tensor names."""
        raise NotImplementedError(
            f"{cls.__name__} has no torch-checkpoint converter; load a "
            "native .ckpt or implement convert_torch_checkpoint")

    @classmethod
    def from_pretrained(cls, path: str | Path, **kwargs) -> "Model":
        from ..training.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        model_blob = ckpt["model"]
        config_dict = model_blob["config"]
        state = model_blob["state"]
        if ckpt.get("format") == "torch":
            # reference .pt: torch tensor names/layouts -> our tree
            config_dict, state = cls.convert_torch_checkpoint(config_dict, state)
        from ..config.registry import build_config

        config = build_config(cls.Config, config_dict)
        rngs = kwargs.pop("rngs", None) or nnx.Rngs(0)
        model = cls(config, rngs=rngs, **kwargs)
        model.load_params(state)
        return model

    def save_pretrained(self, path: str | Path, extra: dict | None = None) -> None:
        from ..training.checkpoint import save_checkpoint
        from ..config.registry import config_to_dict

        save_checkpoint(path, {
            "format": "isp_tts_tpu.v1",
            "model": {
                "class": type(self).__name__,
                "config": config_to_dict(self.config),
                "state": self.state_dict(),
            },
            **(extra or {}),
        })


def _translate_layer_stacking(flat: dict, current: dict) -> dict:
    """Convert transformer layer-stack layouts between per-layer
    (``X.layers.<i>.Y``) and stacked (``X.stack.Y`` with a leading depth
    axis, ``TransformerConfig.pipeline``) so checkpoints move freely between
    dp/tp-trained and pp-trained configurations of the same model.

    ``flat`` is the checkpoint, ``current`` the live model's state dict;
    only keys the model expects but the checkpoint lacks are synthesized,
    and fully-consumed source keys are dropped (so they do not show up as
    "unexpected key" warnings)."""
    import re

    out = dict(flat)
    consumed: set[str] = set()
    for key, cur in current.items():
        if key in out:
            continue
        if ".stack." in key:
            # stacked model <- per-layer checkpoint
            prefix, suffix = key.split(".stack.", 1)
            depth = int(np.shape(cur)[0])
            sources = [f"{prefix}.layers.{i}.{suffix}" for i in range(depth)]
            if all(s in out for s in sources):
                out[key] = np.stack([np.asarray(out[s]) for s in sources])
                consumed.update(sources)
            continue
        m = re.match(r"(.*)\.layers\.(\d+)\.(.*)", key)
        if m:
            # per-layer model <- stacked checkpoint; depth mismatches fall
            # through to load_params' normal missing-key handling (fresh
            # init) instead of crashing on an out-of-range layer index
            src = f"{m.group(1)}.stack.{m.group(3)}"
            i = int(m.group(2))
            if (src in out and np.ndim(out[src]) == np.ndim(cur) + 1
                    and i < np.shape(out[src])[0]):
                out[key] = np.asarray(out[src])[i]
                consumed.add(src)
    for s in consumed:
        out.pop(s, None)
    if consumed:
        logger.info("load_params: translated %d transformer layer-stack "
                    "tensors between per-layer and stacked layouts",
                    len(consumed))
    return out


def _pure(state) -> dict:
    """nnx State -> nested plain dict of arrays."""
    if hasattr(state, "to_pure_dict"):
        return state.to_pure_dict()
    out = {}
    for k, v in state.items():
        if hasattr(v, "items"):
            out[str(k)] = _pure(v)
        else:
            out[str(k)] = v.value if hasattr(v, "value") else v
    return out


def _update_from_flat(state, flat: dict[str, Any], prefix: str = "") -> None:
    for k, v in state.items():
        name = f"{prefix}{k}"
        if hasattr(v, "items"):
            _update_from_flat(v, flat, name + ".")
        elif name in flat:
            old = v.value if hasattr(v, "value") else v
            new = jnp.asarray(flat[name], dtype=np.asarray(old).dtype)
            if hasattr(v, "value"):
                v.value = new
            else:
                state[k] = new
