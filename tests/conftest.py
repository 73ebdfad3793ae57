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

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

# Persistent XLA compilation cache: test models compile once per architecture
# across the whole suite and across runs.
import jax

# The environment pre-sets JAX_PLATFORMS=axon (tunneled TPU) and a
# sitecustomize hook re-asserts it, so the env var alone is not enough —
# the config update is authoritative. Tests must run on the virtual
# 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run on the tunneled TPU"

jax.config.update("jax_compilation_cache_dir", str(_ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


import pytest


@pytest.fixture(autouse=True)
def _no_persistent_cache_for_scheduler_tests(request):
    """Disable the persistent compile cache for the scheduler test modules.

    Each ContinuousBatchingScheduler instance creates a fresh `@jax.jit`
    step closure; identical HLO means the persistent cache serves it via
    executable DESERIALIZATION instead of compilation. After ~280 preceding
    tests the XLA:CPU AOT loader segfaults/aborts on exactly those loads
    (observed deterministically at test_horizon_* in four full-suite runs;
    the same tests pass standalone — a jax/XLA process-state bug, not ours).
    Compiling these tiny programs fresh sidesteps it."""
    if request.module.__name__ in ("test_scheduler", "test_paged_kv",
                                   "test_http_server", "test_examples"):
        import jax

        jax.config.update("jax_enable_compilation_cache", False)
        yield
        jax.config.update("jax_enable_compilation_cache", True)
    else:
        yield
