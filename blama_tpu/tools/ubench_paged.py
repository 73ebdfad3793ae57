"""Paged vs dense fused decode attention at serving sizes (VERDICT r2 #5).

Round 2 measured 1.17 ms (paged) vs 0.90 ms (dense) per dispatch at
B=4/S=2048 — one page per grid step paid per-step fixed cost 16x. Round 3
batches 4 pages per grid step; this A/Bs the same geometry. Timing uses the
differenced-reps methodology (tools/autotune_a8s) to cancel the ~24 ms
tunnel dispatch overhead: a lax.scan chains R attention calls through a
fake layer dependency.

Usage: python -m blama_tpu.tools.ubench_paged [B] [S] [page]
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

R_LO, R_HI = 4, 28


def _timeit(fn, *args, reps=6):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    H, Hkv, D = 32, 8, 128  # 8B geometry
    MP = S // G
    P = B * MP

    from blama_tpu.ops.pallas.decode_attention import (decode_attention,
                                                       effective_inv_freq)
    from blama_tpu.ops.pallas.paged_attention import paged_decode_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    kd = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    vd = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    kv_pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1))
    q_pos = jnp.full((B,), S - 1, jnp.int32)
    invf, _ = effective_inv_freq(D, D, 500000.0)

    # paged layout: identity page placement (perf is placement-independent —
    # each page is one DMA either way)
    kp = kd.reshape(P, G, Hkv, D)
    vp = vd.reshape(P, G, Hkv, D)
    pool_pos = kv_pos.reshape(P, G)
    table = jnp.arange(P, dtype=jnp.int32).reshape(B, MP)

    def chain(call, q):
        def run(q):
            def body(qq, _):
                out = call(qq)
                # chain dependency: fold a droplet of the output back into q
                return qq + out * jnp.bfloat16(1e-8), ()
            qq, _ = jax.lax.scan(body, q, None, length=run.R)
            return qq[0, 0, 0, :8]
        return run

    def time_call(mk):
        f_hi = jax.jit(mk(R_HI))
        f_lo = jax.jit(mk(R_LO))
        t_hi = _timeit(f_hi, q)
        t_lo = _timeit(f_lo, q)
        return (t_hi - t_lo) / (R_HI - R_LO)

    def mk_dense(R):
        def run(qq):
            def body(acc, _):
                out = decode_attention(acc, kd, vd, q_pos, kv_pos, invf)
                return acc + out * jnp.bfloat16(1e-8), ()
            acc, _ = jax.lax.scan(body, qq, None, length=R)
            return acc[0, 0, 0, :8]
        return run

    def mk_paged(R):
        def run(qq):
            def body(acc, _):
                out = paged_decode_attention(acc, kp, vp, pool_pos, table,
                                             q_pos, invf)
                return acc + out * jnp.bfloat16(1e-8), ()
            acc, _ = jax.lax.scan(body, qq, None, length=R)
            return acc[0, 0, 0, :8]
        return run

    kv_mb = 2 * B * S * Hkv * D * 2 / 1e6
    td = time_call(mk_dense)
    tp = time_call(mk_paged)
    print(f"B={B} S={S} page={G} (KV {kv_mb:.0f} MB/dispatch)")
    print(f"dense fused: {td*1e3:7.3f} ms/dispatch  {kv_mb/td/1e3:6.1f} GB/s")
    print(f"paged (x4-batched): {tp*1e3:7.3f} ms/dispatch  {kv_mb/tp/1e3:6.1f} GB/s")
    print(f"ratio paged/dense: {tp/td:.3f}")


if __name__ == "__main__":
    main()
