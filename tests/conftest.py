"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Sharding tests run on a host-CPU mesh (xla_force_host_platform_device_count=8)
so multi-chip layouts are validated without TPU hardware. Must run before the
first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
