"""Import the reference PyTorch implementation (`/root/reference/tts`) with
stand-ins for its missing third-party deps, for full-model numerical parity
testing against this framework (VERDICT r1 item 2).

Shimmed: omegaconf (mini dict-based DictConfig/OmegaConf covering exactly
what `tts/modules/constructor.py:87-105` and `tts/models/base.py:38-56`
consume), loguru, numba (identity @jit + prange, so the reference CPU MAS
runs as pure Python on tiny lattices), torchaudio (functional.create_dct
implemented; transforms stubbed), phonemizer, unidecode.

Only the shims live here — no reference code is copied.
"""

from __future__ import annotations

import logging
import math
import sys
import types

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# omegaconf
# ---------------------------------------------------------------------------

def _build_omegaconf() -> types.ModuleType:
    mod = types.ModuleType("omegaconf")
    MISSING = "???"

    class DictConfig(dict):
        def __init__(self, data=None, **kw):
            super().__init__()
            for k, v in dict(data or {}, **kw).items():
                self[k] = v

        def __setitem__(self, key, value):
            super().__setitem__(key, _wrap(value))

        def __getattr__(self, key):
            try:
                return self[key]
            except KeyError:
                raise AttributeError(key) from None

        def __setattr__(self, key, value):
            self[key] = value

        def _get_flag(self, name):
            return False

        def _key(self):
            return None

    class ListConfig(list):
        pass

    def _wrap(value):
        if isinstance(value, (DictConfig, ListConfig)):
            return value
        if isinstance(value, dict):
            return DictConfig(value)
        if isinstance(value, (list, tuple)):
            return ListConfig(_wrap(v) for v in value)
        return value

    def _merge_into(dst: DictConfig, src) -> None:
        for k, v in dict(src).items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                _merge_into(dst[k], v)
            else:
                dst[k] = v

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            return _wrap({} if obj is None else obj)

        @staticmethod
        def merge(*containers):
            out = DictConfig()
            for c in containers:
                _merge_into(out, c)
            return out

        @staticmethod
        def set_readonly(cfg, flag):
            pass

        @staticmethod
        def set_struct(cfg, flag):
            pass

        @staticmethod
        def to_container(cfg, resolve=False):
            def rec(v):
                if isinstance(v, dict):
                    return {k: rec(x) for k, x in v.items()}
                if isinstance(v, (list, tuple)):
                    return [rec(x) for x in v]
                return v

            return rec(cfg)

        @staticmethod
        def resolve(cfg):
            pass

    mod.MISSING = MISSING
    mod.DictConfig = DictConfig
    mod.ListConfig = ListConfig
    mod.OmegaConf = OmegaConf
    return mod


# ---------------------------------------------------------------------------
# the rest
# ---------------------------------------------------------------------------

def _build_loguru() -> types.ModuleType:
    mod = types.ModuleType("loguru")
    mod.logger = logging.getLogger("reference")
    return mod


def _build_numba() -> types.ModuleType:
    mod = types.ModuleType("numba")

    def jit(*args, **kwargs):  # @jit(nopython=True, parallel=True)
        if args and callable(args[0]):
            return args[0]
        return lambda fn: fn

    cuda = types.ModuleType("numba.cuda")
    cuda.jit = jit
    cuda.is_available = lambda: False

    mod.jit = jit
    mod.njit = jit
    mod.prange = range
    mod.cuda = cuda
    mod.NumbaPerformanceWarning = type("NumbaPerformanceWarning", (Warning,), {})
    sys.modules["numba.cuda"] = cuda
    return mod


def _build_torchaudio() -> types.ModuleType:
    import torch

    mod = types.ModuleType("torchaudio")
    functional = types.ModuleType("torchaudio.functional")
    transforms = types.ModuleType("torchaudio.transforms")

    def create_dct(n_mfcc: int, n_mels: int, norm: str | None = None):
        """DCT-II matrix, (n_mels, n_mfcc), matching torchaudio semantics."""
        n = torch.arange(float(n_mels))
        k = torch.arange(float(n_mfcc)).unsqueeze(1)
        dct = torch.cos(math.pi / float(n_mels) * (n + 0.5) * k)  # (n_mfcc, n_mels)
        if norm is None:
            dct *= 2.0
        else:
            assert norm == "ortho"
            dct[0] *= 1.0 / math.sqrt(2.0)
            dct *= math.sqrt(2.0 / float(n_mels))
        return dct.t()

    def _unavailable(*a, **k):
        raise RuntimeError("torchaudio is shimmed; audio IO is unavailable")

    functional.create_dct = create_dct
    for name in ("Spectrogram", "MelScale", "MelSpectrogram", "Resample"):
        # providers subclass these (reference providers.py:35), so they must
        # be real nn.Module classes; using them raises
        cls = type(name, (torch.nn.Module,), {"forward": _unavailable})
        setattr(transforms, name, cls)
    mod.functional = functional
    mod.transforms = transforms
    mod.load = _unavailable
    mod.info = _unavailable
    sys.modules["torchaudio.functional"] = functional
    sys.modules["torchaudio.transforms"] = transforms
    return mod


def _build_phonemizer() -> types.ModuleType:
    mod = types.ModuleType("phonemizer")
    backend = types.ModuleType("phonemizer.backend")

    def _unavailable(*a, **k):
        raise RuntimeError("phonemizer is shimmed; espeak is unavailable")

    backend.EspeakBackend = _unavailable
    mod.backend = backend
    separator = types.ModuleType("phonemizer.separator")
    separator.Separator = _unavailable
    mod.separator = separator
    sys.modules["phonemizer.backend"] = backend
    sys.modules["phonemizer.separator"] = separator
    return mod


def _build_unidecode() -> types.ModuleType:
    mod = types.ModuleType("unidecode")
    mod.unidecode = lambda s: s
    return mod


_BUILDERS = {
    "omegaconf": _build_omegaconf,
    "loguru": _build_loguru,
    "numba": _build_numba,
    "torchaudio": _build_torchaudio,
    "phonemizer": _build_phonemizer,
    "unidecode": _build_unidecode,
}


def install_shims() -> None:
    for name, builder in _BUILDERS.items():
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = builder()


def import_reference():
    """Install shims and import the reference `tts` package. Returns the
    imported top-level module."""
    install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import tts  # noqa: F401

    return tts
