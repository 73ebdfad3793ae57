"""Perplexity evaluation over a token stream.

North-star acceptance (BASELINE.json): perplexity at a given bit-width must
match llama.cpp's within its stated delta. This tool computes PPL =
exp(mean NLL of next-token prediction) over a text/token corpus, windowed
like llama.cpp's perplexity example (non-overlapping context windows).

Usage: python -m blama_tpu.tools.perplexity <model.gguf> <text-file>
                [--ctx 512] [--dtype bfloat16]
"""

from __future__ import annotations

import math

import numpy as np


def perplexity(model, tokens: list[int], ctx: int = 512) -> dict:
    """Windowed next-token NLL over `tokens` → {ppl, nll, count}."""
    import jax.numpy as jnp

    from ..models.llama import LlamaStatic, all_logits
    from ..ops.kv_cache import KVCache

    cfg = model.config
    st = LlamaStatic.of(cfg)

    total_nll = 0.0
    count = 0
    for start in range(0, max(len(tokens) - 1, 1), ctx):
        window = tokens[start: start + ctx + 1]
        if len(window) < 2:
            break
        T = ctx
        inp = np.zeros((1, T), np.int32)
        n = min(len(window) - 1, T)
        inp[0, :n] = window[:n]
        pos = np.zeros((1, T), np.int32)
        pos[0, :n] = np.arange(n)
        slots = np.full((1, T), T, np.int32)
        slots[0, :n] = np.arange(n)
        cache = KVCache.create(cfg.n_layer, 1, T, cfg.n_head_kv, cfg.head_dim_, jnp.float32)
        logits, _ = all_logits(st, model.weights, jnp.asarray(inp),
                               jnp.asarray(pos), jnp.asarray(slots), cache)
        lg = np.asarray(logits[0, :n]).astype(np.float64)  # [n, V]
        targets = np.asarray(window[1: n + 1])
        # skip the first half of the first window like llama.cpp (warmup ctx)
        lo = n // 2 if start == 0 and len(tokens) > ctx else 0
        lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + lg.max(-1)
        nll = lse - lg[np.arange(n), targets]
        total_nll += float(nll[lo:].sum())
        count += n - lo
    ppl = math.exp(total_nll / count) if count else float("inf")
    return {"ppl": ppl, "nll": total_nll / max(count, 1), "count": count}


def main() -> None:
    import argparse

    from ..runtime.model import Model, ModelParams

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("textfile")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    model = Model(args.model, ModelParams(dtype=args.dtype))
    with open(args.textfile, encoding="utf-8") as f:
        text = f.read()
    tokens = model.vocab.tokenize(text, True, False)
    result = perplexity(model, tokens, args.ctx)
    print(f"perplexity: {result['ppl']:.4f}  (nll {result['nll']:.4f} over {result['count']} tokens)")


if __name__ == "__main__":
    main()
