"""Registry + dataclass-config construction.

Replacement for the reference's Constructor/Registry framework
(`tts/modules/constructor.py:14-157`): every module has a config dataclass;
``build_config`` reconciles YAML dicts with the dataclass signature (warns on
unknown keys, errors on MISSING); ``Registry`` dispatches ``_name_`` /
``_target_`` strings to registered classes.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import typing
from typing import Any, Type, TypeVar

logger = logging.getLogger("isp_tts_tpu")


class _Missing:
    def __repr__(self) -> str:  # pragma: no cover
        return "???"


#: Sentinel for required config fields (reference uses OmegaConf's "???").
MISSING = _Missing()

T = TypeVar("T")

_META_KEYS = ("_name_", "_target_", "_disable_", "_train_", "_eval_", "_general_", "_defaults_")


def strip_meta(cfg: dict) -> dict:
    """Drop config keys starting with ``_`` before constructor use.

    Parity: reference strips underscore keys in Constructor._pre_init
    (tts/modules/constructor.py:63) and modules.py:150.
    """
    return {k: v for k, v in cfg.items() if not k.startswith("_")}


def filter_to_fields(config_cls: Type[T], cfg: dict, warn_extra: bool = True) -> dict:
    names = {f.name for f in dataclasses.fields(config_cls)}
    known, extra = {}, []
    for k, v in cfg.items():
        if k in names:  # declared fields win, even meta-style ones (_target_)
            known[k] = v
        elif k.startswith("_"):  # undeclared meta keys are silently dropped
            continue
        else:
            extra.append(k)
    if extra and warn_extra:
        logger.warning("%s: ignoring unknown config keys %s", config_cls.__name__, extra)
    return known


@functools.lru_cache(maxsize=None)
def _resolved_hints(config_cls: type) -> dict:
    """Field type hints with string annotations (PEP 563) resolved."""
    try:
        return typing.get_type_hints(config_cls)
    except Exception:  # unresolvable forward refs: fall back to raw types
        return {f.name: f.type for f in dataclasses.fields(config_cls)}


def _unwrap_dataclass_type(ftype: Any) -> type | None:
    """Extract the dataclass member from a (possibly Optional/Union) hint."""
    if dataclasses.is_dataclass(ftype):
        return ftype
    for arg in typing.get_args(ftype):
        if dataclasses.is_dataclass(arg):
            return arg
    return None


def _coerce(config_cls: type, name: str, value: Any) -> Any:
    """Recursively build nested config dataclasses from dicts."""
    ftype = _unwrap_dataclass_type(_resolved_hints(config_cls).get(name))
    if ftype is not None and isinstance(value, dict):
        return build_config(ftype, value)
    return value


def build_config(config_cls: Type[T], cfg: dict | None = None, **kwargs) -> T:
    """Build a config dataclass from a YAML dict + kwargs (kwargs win).

    Errors on MISSING required fields; warns on unknown keys; recursively
    constructs dataclass-typed sub-configs.
    """
    cfg = dict(cfg or {})
    cfg.update(kwargs)
    known = filter_to_fields(config_cls, cfg)
    for name, value in list(known.items()):
        known[name] = _coerce(config_cls, name, value)
    obj = config_cls(**known)
    for f in dataclasses.fields(config_cls):
        v = getattr(obj, f.name)
        if isinstance(v, _Missing) or (isinstance(v, str) and v == "???"):
            raise ValueError(f"{config_cls.__name__}.{f.name} is required (MISSING)")
        # nested dataclass fields may arrive as dicts via defaults
        coerced = _coerce(config_cls, f.name, v)
        if coerced is not v:
            setattr(obj, f.name, coerced)
    return obj


def config_to_dict(obj: Any) -> Any:
    """Recursive dataclass -> plain dict (JSON/YAML-serializable)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: config_to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {k: config_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [config_to_dict(v) for v in obj]
    if isinstance(obj, _Missing):
        return None
    return obj


class Registry:
    """Name -> class registry with ``instantiate`` dispatch.

    Parity: reference ``Registry`` (tts/modules/constructor.py:113-157).
    """

    def __init__(self, name: str):
        self.name = name
        self._map: dict[str, type] = {}

    def register(self, name: str | None = None):
        def deco(cls):
            self._map[name or cls.__name__] = cls
            return cls

        return deco

    def add(self, name: str, cls: type) -> None:
        self._map[name] = cls

    def get(self, name: str) -> type:
        if name not in self._map:
            raise KeyError(
                f"{self.name} registry has no entry {name!r}; known: {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def keys(self):
        return self._map.keys()

    def instantiate(self, cfg: dict, key: str = "_target_", **kwargs):
        """Instantiate the class selected by ``cfg[key]``.

        If the class exposes a ``Config`` dataclass attribute, the YAML dict is
        reconciled through :func:`build_config`; otherwise remaining keys are
        passed as keyword arguments.
        """
        name = cfg.get(key) or cfg.get("_name_")
        if name is None:
            raise ValueError(f"{self.name}: config needs `{key}` or `_name_`: {cfg}")
        cls = self.get(name)
        config_cls = getattr(cls, "Config", None)
        if config_cls is not None and dataclasses.is_dataclass(config_cls):
            config = build_config(config_cls, cfg)
            return cls(config, **kwargs)
        return cls(**strip_meta(cfg), **kwargs)
