#!/usr/bin/env python
"""Benchmark: decode throughput on the flagship (llama-family) model.

Run by the driver on real TPU hardware at the end of every round; prints ONE
JSON line {"metric", "value", "unit", "vs_baseline"}.

Default configuration: Llama-3-8B-geometry Q4_K GGUF — THE BASELINE.json
headline metric ("tokens/sec/chip at Q4_K 8B") — running via the fused
Q4_K Pallas kernel (the only way 8B fits a single 16GB v5e chip). Full load
path (GGUF parse → native repack → upload) + the on-device fused decode
loop. The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is null.

Env knobs:
  BLAMA_BENCH_PRESET   llama3-8b (default) | tinyllama-1.1b | debug-0.3b
  BLAMA_BENCH_DTYPE    q4k_fused (default for 8B) | bfloat16 | q4k_a8
  BLAMA_BENCH_STEPS    decode steps to time (default 64)
  BLAMA_BENCH_PROMPT   prompt length (default 128)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _run(preset, wdtype, n_steps, n_prompt) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from blama_tpu.gguf import GGMLType
    from blama_tpu.models.llama import LlamaStatic
    from blama_tpu.ops.generate_loop import greedy_generate
    from blama_tpu.ops.kv_cache import KVCache
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.testing import synthesize_llama_gguf

    path = os.path.join("/tmp", f"blama_bench_{preset}.gguf")
    if not os.path.exists(path):
        t0 = time.time()
        synthesize_llama_gguf(path, preset)
        print(f"# synthesized {preset}: {time.time()-t0:.1f}s "
              f"{os.path.getsize(path)/1e9:.2f}GB", file=sys.stderr)

    t0 = time.time()
    model = Model(path, ModelParams(dtype=wdtype))
    load_s = time.time() - t0
    cfg = model.config
    print(f"# load+dequant+upload: {load_s:.1f}s", file=sys.stderr)

    st = LlamaStatic.of(cfg)
    S = n_prompt + n_steps + 8
    cache = KVCache.create(cfg.n_layer, 1, S, cfg.n_head_kv, cfg.head_dim_, jnp.bfloat16)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(3, cfg.n_vocab - 1, (1, n_prompt)).astype(np.int32))

    # compile + warmup (np.asarray forces a device→host transfer: on the
    # tunneled axon platform block_until_ready alone does not reliably wait)
    t0 = time.time()
    toks, tid, tval, cache2 = greedy_generate(st, model.weights, prompt, cache, n_prompt, n_steps)
    np.asarray(toks)
    print(f"# compile+first-run: {time.time()-t0:.1f}s", file=sys.stderr)

    # timed runs (fresh cache each time; prefill included, so this is a
    # conservative decode rate)
    times = []
    for _ in range(3):
        cache = KVCache.create(cfg.n_layer, 1, S, cfg.n_head_kv, cfg.head_dim_, jnp.bfloat16)
        t0 = time.time()
        toks, tid, tval, cache = greedy_generate(st, model.weights, prompt, cache, n_prompt, n_steps)
        np.asarray(toks)
        np.asarray(tval)
        times.append(time.time() - t0)
    best = min(times)
    tok_s = n_steps / best

    # TTFT: prefill + first decode + first-token transfer (p50 of 5)
    ttfts = []
    for _ in range(5):
        cache = KVCache.create(cfg.n_layer, 1, S, cfg.n_head_kv, cfg.head_dim_, jnp.bfloat16)
        t0 = time.time()
        toks1, _, _, _ = greedy_generate(st, model.weights, prompt, cache, n_prompt, 1)
        np.asarray(toks1)
        ttfts.append(time.time() - t0)
    ttft_p50 = sorted(ttfts)[len(ttfts) // 2]

    result = {
        "metric": f"decode_tokens_per_sec_chip_{preset}_{wdtype}",
        "value": round(tok_s, 2),
        "unit": "tokens/sec/chip",
        "vs_baseline": None,
        "detail": {
            "preset": preset,
            "prompt_len": n_prompt,
            "steps": n_steps,
            "ttft_p50_s": round(ttft_p50, 4),
            "best_wall_s": round(best, 4),
            "all_wall_s": [round(t, 4) for t in times],
            "load_s": round(load_s, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    return result


def main() -> None:
    preset = os.environ.get("BLAMA_BENCH_PRESET", "llama3-8b")
    n_steps = int(os.environ.get("BLAMA_BENCH_STEPS", "64"))
    n_prompt = int(os.environ.get("BLAMA_BENCH_PROMPT", "128"))
    # 8B requires a quantized-weight mode (bf16 would need 16GB for weights
    # alone). q4k_a8 (SWAR int8-MXU, llama.cpp Q8_1-activation numerics) is
    # the fastest mode (102.5 tok/s vs 87.2 exact-dequant, BENCH_LOCAL.md);
    # smaller presets run fastest in bf16.
    default_dtype = "q4k_a8" if preset == "llama3-8b" else "bfloat16"
    wdtype = os.environ.get("BLAMA_BENCH_DTYPE", default_dtype)

    try:
        result = _run(preset, wdtype, n_steps, n_prompt)
    except Exception as e:  # pragma: no cover - fallback for driver runs
        print(f"# primary bench config failed ({type(e).__name__}: {e}); "
              f"falling back to tinyllama-1.1b bf16", file=sys.stderr)
        result = _run("tinyllama-1.1b", "bfloat16", n_steps, n_prompt)
        result["detail"]["fallback_from"] = f"{preset}/{wdtype}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
