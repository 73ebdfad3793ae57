"""Persistent XLA compilation cache for the serving path.

A cold server paid minutes of XLA compile before its first token
(BENCH_r03: 311.8 s at 8B with fused kernels) — a serving defect the
reference never has because llama.cpp ships precompiled kernels. JAX can
persist compiled executables keyed by HLO + flags; with the cache warm, a
fresh process deserializes instead of recompiling. This module wires it up
for every entry point (HTTP server, bench, tools):

  * BLAMA_COMPILE_CACHE=<dir>  — cache directory (default
    ~/.cache/blama_tpu/xla; "0" disables)
  * thresholds are zeroed so even small decode-step programs persist

Call enable_persistent_cache() BEFORE the first jit dispatch; calling it
again is a no-op.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Returns the directory in
    use, or None when disabled (BLAMA_COMPILE_CACHE=0)."""
    global _enabled
    env = os.environ.get("BLAMA_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "blama_tpu", "xla")
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # persist everything: the serving path's step programs are individually
    # small/fast but there are dozens per engine config
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled = True
    return path
