#!/usr/bin/env python
"""Benchmark: decode throughput on the flagship (llama-family) model.

Run by the driver on real TPU hardware at the end of every round; prints ONE
JSON line {"metric", "value", "unit", "vs_baseline"}.

Default configuration: Llama-3-8B-geometry Q4_K GGUF — THE BASELINE.json
headline metric ("tokens/sec/chip at Q4_K 8B") — running via the fused
Q4_K Pallas kernel (the only way 8B fits a single 16GB v5e chip) with the
fused flash decode/prefill attention kernels enabled. Full load path (GGUF
parse → native repack → upload) + the on-device fused decode loop. The
reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
null.

Env knobs:
  BLAMA_BENCH_PRESET   llama3-8b (default) | tinyllama-1.1b | debug-0.3b
  BLAMA_BENCH_DTYPE    q4k_fused (default for 8B) | bfloat16 | q4k_a8
  BLAMA_BENCH_STEPS    decode steps to time (default 512)
  BLAMA_BENCH_PROMPT   prompt length (default 128)
  BLAMA_BENCH_FLASH    1 (default) = Pallas fused attention | 0 = XLA chain
  BLAMA_BENCH_KV       int8 (default; the north-star config) | bfloat16 | float32
  BLAMA_BENCH_CACHE    KV-cache slots, floor (default 2048)

`python bench.py matrix` loads the model once and sweeps flash x prompt
length x KV dtype, printing one line per config (long-context TTFT/decode
evidence for BENCH_LOCAL.md; VERDICT r1 #3).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _load_model(preset, wdtype):
    import jax

    from blama_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), ".jax_cache_tpu"))

    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.testing import (MOE_PRESETS, synthesize_llama_gguf,
                                   synthesize_moe_gguf)

    # q8_0 engines bench against a Q8_0-packed checkpoint (BASELINE config
    # #3); other dtypes share the Q4_K-packed file per preset
    q8 = wdtype == "q8_0_fused"
    path = os.path.join(
        "/tmp", f"blama_bench_{preset}{'_q8_0' if q8 else ''}.gguf")
    if not os.path.exists(path):
        t0 = time.time()
        if preset in MOE_PRESETS:
            synthesize_moe_gguf(path, preset)
        elif q8:
            from blama_tpu.gguf import GGMLType

            synthesize_llama_gguf(path, preset, quant=GGMLType.Q8_0)
        else:
            synthesize_llama_gguf(path, preset)
        print(f"# synthesized {preset}: {time.time()-t0:.1f}s "
              f"{os.path.getsize(path)/1e9:.2f}GB", file=sys.stderr)

    # BLAMA_BENCH_MOE_RAGGED=0 A/Bs the dense masked mixture vs the default
    # ragged grouped-gemm decode (reads only routed experts)
    ragged = os.environ.get("BLAMA_BENCH_MOE_RAGGED", "1") == "1"
    t0 = time.time()
    model = Model(path, ModelParams(dtype=wdtype, moe_ragged=ragged))
    load_s = time.time() - t0
    print(f"# load+dequant+upload: {load_s:.1f}s", file=sys.stderr)
    return model, load_s


def _bench_config(model, n_steps, n_prompt, flash, kv_dtype, reps=3):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from blama_tpu.models.llama import LlamaStatic
    from blama_tpu.ops.generate_loop import greedy_generate
    from blama_tpu.ops.kv_cache import KVCache

    cfg = model.config
    if cfg.is_moe:
        from blama_tpu.models.moe import MoEStatic

        st = MoEStatic.of(cfg)
        flash = False  # MoE forward is XLA-attention only (see runtime/model.py)
    else:
        st = LlamaStatic.of(cfg)
        if flash:
            st = dataclasses.replace(st, attn_fused=True)
    # cache length rounded so the fused kernels' sequence-block picker always
    # finds a divisor (silent XLA fallback would invalidate the A/B); floor of
    # 2048 = the north-star serving context (VERDICT r2 weak #1) — decode
    # attention streams the whole window every step, so this is the honest
    # long-context rate even though the benched prompt is shorter
    S = max(int(os.environ.get("BLAMA_BENCH_CACHE", "2048")),
            _round_up(n_prompt + n_steps + 8, 512))
    kv = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": "int8"}[kv_dtype]

    def fresh_cache():
        return KVCache.create(cfg.n_layer, 1, S, cfg.n_head_kv, cfg.head_dim_, kv)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(3, cfg.n_vocab - 1, (1, n_prompt)).astype(np.int32))

    # compile + warmup (np.asarray forces a device→host transfer: on the
    # tunneled axon platform block_until_ready alone does not reliably wait)
    t0 = time.time()
    toks, tid, tval, _ = greedy_generate(st, model.weights, prompt, fresh_cache(), n_prompt, n_steps)
    np.asarray(toks)
    compile_s = time.time() - t0
    # reported in the result JSON: with the persistent compile cache warm
    # (utils/compile_cache — populated by any prior run of the same code),
    # a COLD PROCESS deserializes instead of recompiling, so this is the
    # serving cold-boot compile cost (VERDICT r3 #4)
    print(f"# compile+first-run p={n_prompt} flash={int(flash)} kv={kv_dtype}: "
          f"{compile_s:.1f}s", file=sys.stderr)

    # timed runs (fresh cache each time; prefill included, so this is a
    # conservative decode rate)
    times = []
    for _ in range(reps):
        cache = fresh_cache()
        t0 = time.time()
        toks, tid, tval, cache = greedy_generate(st, model.weights, prompt, cache, n_prompt, n_steps)
        np.asarray(toks)
        np.asarray(tval)
        times.append(time.time() - t0)
    best = min(times)

    # TTFT: prefill + first decode + first-token transfer (p50 of 5).
    # Cache allocation happens OUTSIDE the timed region — at 2048-slot int8
    # the zeros fills are ~5 tunnel dispatches (~0.15 s) that belong to
    # session setup, not time-to-first-token.
    ttfts = []
    for _ in range(5):
        cache = fresh_cache()
        jax.block_until_ready(cache)  # whole pytree: v/scales/positions too
        t0 = time.time()
        toks1, _, _, _ = greedy_generate(st, model.weights, prompt, cache, n_prompt, 1)
        np.asarray(toks1)
        ttfts.append(time.time() - t0)
    ttft_p50 = sorted(ttfts)[len(ttfts) // 2]
    decode_s = best - ttft_p50  # steady-state decode portion
    tok_s = n_steps / best
    tok_s_decode = max(n_steps - 1, 1) / decode_s if decode_s > 0 else tok_s
    return {
        "prompt_len": n_prompt,
        "steps": n_steps,
        "cache_len": S,
        "attn": "fused" if flash else "xla",
        "kv_dtype": kv_dtype,
        "tok_s_incl_prefill": round(tok_s, 2),
        "tok_s_decode": round(tok_s_decode, 2),
        "ttft_p50_s": round(ttft_p50, 4),
        "best_wall_s": round(best, 4),
        "all_wall_s": [round(t, 4) for t in times],
        "compile_s": round(compile_s, 1),  # warm cache => cold-boot cost
    }


def _run(preset, wdtype, n_steps, n_prompt, flash, kv_dtype) -> dict:
    import jax

    model, load_s = _load_model(preset, wdtype)
    row = _bench_config(model, n_steps, n_prompt, flash, kv_dtype)
    return {
        "metric": f"decode_tokens_per_sec_chip_{preset}_{wdtype}",
        "value": row["tok_s_incl_prefill"],
        "unit": "tokens/sec/chip",
        "vs_baseline": None,
        "detail": {
            "preset": preset,
            **row,
            "load_s": round(load_s, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def matrix() -> None:
    """Long-context / engine-mode sweep on one loaded model (BENCH_LOCAL)."""
    preset = os.environ.get("BLAMA_BENCH_PRESET", "llama3-8b")
    wdtype = os.environ.get("BLAMA_BENCH_DTYPE",
                            "q4k_a8" if preset == "llama3-8b" else "bfloat16")
    model, _ = _load_model(preset, wdtype)
    configs = json.loads(os.environ.get("BLAMA_BENCH_MATRIX", json.dumps([
        # [prompt, steps, flash, kv_dtype]
        [128, 64, False, "bfloat16"],
        [128, 64, True, "bfloat16"],
        [2048, 256, False, "bfloat16"],
        [2048, 256, True, "bfloat16"],
        [2048, 256, True, "int8"],
        [8192, 128, True, "int8"],
    ])))
    for p, s, fl, kv in configs:
        try:
            row = _bench_config(model, s, p, fl, kv)
            print(json.dumps({"preset": preset, "dtype": wdtype, **row}))
        except Exception as e:  # keep sweeping
            print(f"# config p={p} flash={fl} kv={kv} FAILED: {e}", file=sys.stderr)


def main() -> None:
    preset = os.environ.get("BLAMA_BENCH_PRESET", "llama3-8b")
    # 256 steps: the decode loop is ONE fused device dispatch, so the ~25 ms
    # tunnel dispatch overhead is a fixed cost — at 64 steps it inflated the
    # per-step time by ~0.4 ms (trace-measured while body 7.86 ms vs 8.2 ms
    # benched). 256 steps amortizes it to <0.1 ms; still well inside the
    # 2048-slot window with the 128-token prompt.
    n_steps = int(os.environ.get("BLAMA_BENCH_STEPS", "512"))
    n_prompt = int(os.environ.get("BLAMA_BENCH_PROMPT", "128"))
    # 8B requires a quantized-weight mode (bf16 would need 16GB for weights
    # alone). q4k_a8 (SWAR int8-MXU, llama.cpp Q8_1-activation numerics) is
    # the fastest mode (102.5 tok/s vs 87.2 exact-dequant, BENCH_LOCAL.md);
    # smaller presets run fastest in bf16.
    # MoE presets default to packed expert banks (QuantExperts): 254 vs 22.5
    # tok/s at mixtral-scaled (BENCH_LOCAL.md round 2)
    if preset == "llama3-8b":
        default_dtype = "q4k_a8"
    elif preset in ("mixtral-scaled", "mixtral-debug"):
        default_dtype = "q4k_fused"
    else:
        default_dtype = "bfloat16"
    wdtype = os.environ.get("BLAMA_BENCH_DTYPE", default_dtype)
    flash = os.environ.get("BLAMA_BENCH_FLASH", "1") == "1"
    # int8 KV is the north-star headline config (BASELINE.json; VERDICT r2 #1)
    kv_dtype = os.environ.get("BLAMA_BENCH_KV", "int8")

    try:
        result = _run(preset, wdtype, n_steps, n_prompt, flash, kv_dtype)
    except Exception as e:  # pragma: no cover - fallback for driver runs
        print(f"# primary bench config failed ({type(e).__name__}: {e}); "
              f"falling back to tinyllama-1.1b bf16 xla-attn", file=sys.stderr)
        result = _run("tinyllama-1.1b", "bfloat16", n_steps, n_prompt, False,
                      "bfloat16")
        result["detail"]["fallback_from"] = f"{preset}/{wdtype}"
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "matrix":
        matrix()
    else:
        main()
