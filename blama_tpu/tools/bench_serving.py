"""Continuous-batching serving throughput (VERDICT r2 next #3).

Drives ContinuousBatchingScheduler with N concurrent generation streams on
the real model and reports aggregate tokens/s/chip, per-stream latency, and
the dense-vs-paged comparison. The reference's server is a 1-request queue
(Server.cpp:27-36); this records the win that justified the batched design.

Note the axon tunnel adds ~24 ms per host->device dispatch and the scheduler
makes one dispatch per batched token step (host-side samplers), so the
tunnel floor is ~40 steps/s regardless of batch width. Aggregate tok/s
scales with batch width on top of that floor; on a directly-attached host
the same loop dispatches at ~0.3 ms.

Usage: python -m blama_tpu.tools.bench_serving [preset] [dtype]
  BLAMA_SERVE_STREAMS   concurrent request count (default 16)
  BLAMA_SERVE_BATCH     scheduler max_batch (default 8)
  BLAMA_SERVE_TOKENS    tokens per request (default 48)
  BLAMA_SERVE_PROMPT    prompt length (default 64)
  BLAMA_SERVE_PAGED     1 = paged KV pool mode
  BLAMA_SERVE_CTX       per-row context window (default 2048)
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "llama3-8b"
    wdtype = sys.argv[2] if len(sys.argv) > 2 else (
        "q4k_a8" if preset == "llama3-8b" else "bfloat16")
    n_streams = int(os.environ.get("BLAMA_SERVE_STREAMS", "16"))
    max_batch = int(os.environ.get("BLAMA_SERVE_BATCH", "8"))
    n_tokens = int(os.environ.get("BLAMA_SERVE_TOKENS", "48"))
    n_prompt = int(os.environ.get("BLAMA_SERVE_PROMPT", "64"))
    paged = os.environ.get("BLAMA_SERVE_PAGED", "0") == "1"
    ctx = int(os.environ.get("BLAMA_SERVE_CTX", "2048"))

    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.sampler import SamplerParams
    from blama_tpu.server.scheduler import (ContinuousBatchingScheduler,
                                            GenRequest)
    from blama_tpu.testing import MOE_PRESETS, synthesize_llama_gguf, \
        synthesize_moe_gguf

    path = os.path.join("/tmp", f"blama_bench_{preset}.gguf")
    if not os.path.exists(path):
        (synthesize_moe_gguf if preset in MOE_PRESETS
         else synthesize_llama_gguf)(path, preset)
    t0 = time.time()
    model = Model(path, ModelParams(dtype=wdtype))
    print(f"# load: {time.time()-t0:.1f}s", file=sys.stderr)

    horizon = int(os.environ.get("BLAMA_SERVE_HORIZON", "8"))
    sched = ContinuousBatchingScheduler(model, max_batch=max_batch,
                                        ctx_size=ctx, paged=paged,
                                        horizon=horizon)
    rng = np.random.default_rng(0)
    done = {}
    t_submit = {}

    def mk_req(i):
        prompt = rng.integers(3, model.config.n_vocab - 1, n_prompt).tolist()

        def on_done(preds, i=i):
            done[i] = (time.time(), len(preds))
        return GenRequest(prompt=prompt, max_tokens=n_tokens,
                          sampler_params=SamplerParams(temp=0.0),
                          on_done=on_done)

    # warmup (compile both prefill bucket shapes + decode step)
    sched.submit(mk_req(-1))
    t0 = time.time()
    sched.run_until_idle()
    print(f"# warmup (compile): {time.time()-t0:.1f}s", file=sys.stderr)
    done.clear()

    t_start = time.time()
    for i in range(n_streams):
        t_submit[i] = time.time()
        sched.submit(mk_req(i))
    sched.run_until_idle()
    wall = time.time() - t_start

    total_tokens = sum(n for _, n in done.values())
    lats = sorted(done[i][0] - t_submit[i] for i in done)
    out = {
        "metric": f"serving_tokens_per_sec_chip_{preset}_{wdtype}",
        "value": round(total_tokens / wall, 2),
        "unit": "tokens/sec/chip",
        "detail": {
            "streams": n_streams, "max_batch": max_batch,
            "tokens_per_req": n_tokens, "prompt_len": n_prompt,
            "paged": paged, "ctx": ctx, "horizon": sched.horizon,
            "wall_s": round(wall, 2),
            "completed": len(done),
            "latency_p50_s": round(lats[len(lats) // 2], 2),
            "latency_p90_s": round(lats[int(len(lats) * 0.9)], 2),
            "decode_step_ms": round(
                1e3 * sched.metrics.counters["decode_step"].mean_s, 3)
            if "decode_step" in sched.metrics.counters else None,
            "tokens_decoded": sched.metrics.tokens_decoded,
        },
    }
    print(json.dumps(out))
    model.close()


if __name__ == "__main__":
    main()
