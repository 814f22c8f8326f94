"""Persistent XLA compilation cache shared by every entry point.

The trainer enables this via TrainerConfig.compilation_cache; standalone
entry points (bench.py, tools/bench_*.py, __graft_entry__) call
``enable_compile_cache()`` so repeat runs — including the driver's — skip
the multi-minute fresh compile on a single-core host.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "~/.cache/isp_tts_tpu/xla"


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """``ISP_TTS_TPU_XLA_CACHE`` overrides the location (benchmarks use it
    to measure genuinely cold caches)."""
    import jax

    cache_dir = (cache_dir or os.environ.get("ISP_TTS_TPU_XLA_CACHE")
                 or DEFAULT_CACHE_DIR)
    cache = os.path.expanduser(cache_dir)
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
