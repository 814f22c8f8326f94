"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's host-platform
device-count override, per the framework's test strategy (SURVEY.md §4).

Note: this environment's sitecustomize force-registers the `axon` TPU
platform and overrides JAX_PLATFORMS, so the platform must be forced back to
CPU via jax.config AFTER import (env vars alone are ignored).
"""

import os

if os.environ.get("ISP_TTS_TPU_TESTS") == "1":
    # opt-out: run on the real accelerator so @requires_tpu tests execute
    # (e.g. ISP_TTS_TPU_TESTS=1 pytest tests/test_flash_attention.py)
    pass
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
