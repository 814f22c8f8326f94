"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's host-platform
device-count override, per the framework's test strategy (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
