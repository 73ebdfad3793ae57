"""Quantization perplexity delta across engine dtypes (VERDICT r2 next #9).

Real-model PPL-vs-llama.cpp acceptance is blocked on model availability
(zero egress); as the stand-in this measures the QUANTIZATION ppl delta on
the synthesized checkpoints: same GGUF evaluated under bf16 vs the packed
engines. The corpus is deterministic pseudo-tokens — the model is synthetic
either way, so the informative number is the DELTA (quantization noise on
the next-token distribution), not the absolute ppl.

Usage: python -m blama_tpu.tools.ppl_compare [preset] [ctx] [windows]
"""
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "tinyllama-1.1b"
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    windows = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.testing import synthesize_llama_gguf
    from blama_tpu.tools.perplexity import perplexity

    path = os.path.join("/tmp", f"blama_bench_{preset}.gguf")
    if not os.path.exists(path):
        synthesize_llama_gguf(path, preset)

    probe = Model(path, ModelParams(vocab_only=True))
    n_vocab = probe.config.n_vocab
    probe.close()
    rng = np.random.default_rng(42)
    tokens = rng.integers(3, n_vocab - 1, ctx * windows + 1).tolist()

    out = {}
    for dtype in ("bfloat16", "q4k_fused", "q4k_a8"):
        m = Model(path, ModelParams(dtype=dtype))
        r = perplexity(m, tokens, ctx=ctx)
        m.close()
        out[dtype] = r
        print(f"# {dtype}: ppl={r['ppl']:.4f} nll={r['nll']:.5f} "
              f"n={r['count']}", file=sys.stderr)
    base = out["bfloat16"]["ppl"]
    print(json.dumps({
        "preset": preset, "ctx": ctx, "windows": windows,
        "ppl": {k: round(v["ppl"], 4) for k, v in out.items()},
        "delta_vs_bf16_pct": {
            k: round(100.0 * (v["ppl"] - base) / base, 3)
            for k, v in out.items() if k != "bfloat16"},
    }))


if __name__ == "__main__":
    main()
