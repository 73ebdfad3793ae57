"""Attribute the 8B decode step's non-weight time.

probe_ceiling measured the q4k_a8 kernel streaming 64 distinct FFN-shaped
layers at ~760 GB/s (93% of v5e spec) and a bf16 decode-shaped matmul chain
at ~716 GB/s — yet end-to-end decode runs at ~514 GB/s effective. The
round-1 conclusion "a8s is at ~94% of the streaming ceiling, next win needs
a lower-bit format" (NEXT.md r1 #1) compared against the WRONG ceiling (an
XLA sum-reduce at ~504 GB/s). The real gap is ~3 ms/step of non-weight time.
This tool breaks the fused greedy loop into ablations to find it:

  full        argmax -> forward -> top-10 capture   (bench.py's loop)
  no_topk     argmax -> forward                     (drop lax.top_k(V))
  forced      forward only, teacher-forced token    (drop argmax + logits
              read dependency; still computes the head)
  hidden      forward(return_hidden) teacher-forced (drop the head matmul)

plus microbenches of the pieces (head matmul, top_k, argmax) over distinct
activations so XLA cannot hoist them.

Usage: python -m blama_tpu.tools.profile_step [preset] [n_steps]
(defaults: llama3-8b q4k_a8 64 steps; reuses the bench.py GGUF cache.)
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from functools import partial


def _time_loop(fn, *args, reps=3):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile+settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "llama3-8b"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    wdtype = os.environ.get("BLAMA_BENCH_DTYPE", "q4k_a8")

    from blama_tpu.models.llama import LlamaStatic, forward
    from blama_tpu.ops.kv_cache import KVCache
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.testing import synthesize_llama_gguf

    path = os.path.join("/tmp", f"blama_bench_{preset}.gguf")
    if not os.path.exists(path):
        synthesize_llama_gguf(path, preset)
    model = Model(path, ModelParams(dtype=wdtype))
    cfg = model.config
    st = LlamaStatic.of(cfg)
    if os.environ.get("BLAMA_PROFILE_FLASH", "1") == "1":
        import dataclasses

        st = dataclasses.replace(st, attn_fused=True)
    S = int(os.environ.get("BLAMA_PROFILE_CACHE", "2048"))
    kv = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": "int8"}[
        os.environ.get("BLAMA_PROFILE_KV", "int8")]
    cache = KVCache.create(cfg.n_layer, 1, S, cfg.n_head_kv, cfg.head_dim_,
                           kv)
    params = model.weights

    # prefill a few tokens so the loop starts from a realistic state
    P = 8
    toks = jnp.arange(5, 5 + P, dtype=jnp.int32)[None]
    pos = jnp.arange(P, dtype=jnp.int32)[None]
    logits0, cache = jax.jit(
        lambda p, t, q, s, c: forward(p, st, t, q, s, c,
                                      jnp.array([P - 1], jnp.int32))
    )(params, toks, pos, pos, cache)

    def mk_loop(mode):
        @partial(jax.jit, static_argnums=())
        def run(params, cache, logits0):
            def body(carry, _):
                cache, logits, pos = carry
                if mode == "full" or mode == "no_topk":
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    tok = (pos % 97 + 5).astype(jnp.int32)  # teacher-forced
                if mode == "hidden":
                    h, cache = forward(params, st, tok[:, None], pos[:, None],
                                       pos[:, None], cache,
                                       jnp.zeros((1,), jnp.int32),
                                       return_hidden=True)
                    # keep a dependency so nothing is elided
                    logits = logits * 0 + h.sum()
                else:
                    logits, cache = forward(params, st, tok[:, None],
                                            pos[:, None], pos[:, None], cache,
                                            jnp.zeros((1,), jnp.int32))
                out = ()
                if mode == "full":
                    out = jax.lax.top_k(logits, 10)
                return (cache, logits, pos + 1), out
            (cache2, lg, _), outs = jax.lax.scan(
                body, (cache, logits0, jnp.array([P], jnp.int32)), None,
                length=n_steps)
            return lg, outs
        return run

    results = {}
    for mode in os.environ.get("BLAMA_PROFILE_MODES",
                                "full,no_topk,forced,hidden").split(","):
        dt = _time_loop(mk_loop(mode), params, cache, logits0)
        results[mode] = dt / n_steps * 1e3
        print(f"{mode:8s} {results[mode]:7.3f} ms/step")

    if all(m in results for m in ("full", "no_topk", "forced", "hidden")):
        print(f"\nattribution (ms/step):")
        print(f"  top-10 capture      {results['full'] - results['no_topk']:7.3f}")
        print(f"  argmax+logits dep   {results['no_topk'] - results['forced']:7.3f}")
        print(f"  logits head         {results['forced'] - results['hidden']:7.3f}")
        print(f"  layers+attn+embed   {results['hidden']:7.3f}")
    if os.environ.get("BLAMA_PROFILE_MODES"):
        return

    # piece microbenches over distinct activations (no hoisting possible)
    E = cfg.n_embd
    V = params["output"].n_out if hasattr(params["output"], "n_out") else (
        params["output"].shape[1])
    xs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (n_steps, 1, E)), jnp.float32)

    from blama_tpu.ops.pallas.quant_matmul import qmm_nblocked

    @jax.jit
    def head_loop(params, xs):
        def body(acc, x):
            y = qmm_nblocked(x, params["output"], 0)
            return acc + y.sum(), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    dt = _time_loop(head_loop, params, xs)
    print(f"\nhead matmul alone    {dt / n_steps * 1e3:7.3f} ms/step")

    lg = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n_steps, 1, V)), jnp.float32)

    @jax.jit
    def topk_loop(lg):
        def body(acc, l):
            v, i = jax.lax.top_k(l, 10)
            return acc + v.sum() + i.sum(), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), lg)
        return acc

    dt = _time_loop(topk_loop, lg)
    print(f"top_k(10) alone      {dt / n_steps * 1e3:7.3f} ms/step")

    @jax.jit
    def argmax_loop(lg):
        def body(acc, l):
            return acc + jnp.argmax(l, axis=-1).sum().astype(jnp.int32), ()
        acc, _ = jax.lax.scan(body, jnp.int32(0), lg)
        return acc

    dt = _time_loop(argmax_loop, lg)
    print(f"argmax alone         {dt / n_steps * 1e3:7.3f} ms/step")
    model.close()


if __name__ == "__main__":
    main()
