"""Decode-attention block-size A/B at the serving geometry (round 4).

The device trace attributes 27.7 us/call to the fused decode kernel at
8B/S=2048/int8 vs ~5.4 us of pure cache streaming. This times the stacked
layer= dispatch (the production call) under different sequence-block caps
(BLAMA_ATTN_BLOCK_CAP — read at import, so each cap runs in its own
process) with the differenced-reps methodology.

Usage: BLAMA_ATTN_BLOCK_CAP=2048 python -m blama_tpu.tools.ubench_attn [S] [L]
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

R_LO, R_HI = 8, 40


def _timeit(fn, *args, reps=6):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B, H, Hkv, D = 1, 32, 8, 128  # 8B geometry

    from blama_tpu.ops.pallas.decode_attention import (
        _BLOCK_CAP, decode_attention, effective_inv_freq)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    k = jnp.asarray(
        rng.integers(-127, 128, (L, B, S, Hkv * D)), jnp.int8)
    v = jnp.asarray(
        rng.integers(-127, 128, (L, B, S, Hkv * D)), jnp.int8)
    ks = jnp.asarray(rng.random((L, B, S, Hkv)) * 0.01 + 0.01, jnp.float32)
    vs = jnp.asarray(rng.random((L, B, S, Hkv)) * 0.01 + 0.01, jnp.float32)
    kv_pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1))
    q_pos = jnp.full((B,), S - 1, jnp.int32)
    invf, ms = effective_inv_freq(D, D, 500000.0)

    def mk(R):
        def run(qq):
            def body(acc, _):
                out = acc
                for li in range(L):
                    out = decode_attention(
                        out, k, v, q_pos, kv_pos, invf,
                        k_scale=ks, v_scale=vs, mscale=ms, layer=li)
                return acc + out * jnp.bfloat16(1e-8), ()
            acc, _ = jax.lax.scan(body, qq, None, length=R // L)
            return acc[0, 0, 0, :8]
        return run

    t_hi = _timeit(jax.jit(mk(R_HI)), q)
    t_lo = _timeit(jax.jit(mk(R_LO)), q)
    per_call = (t_hi - t_lo) / (R_HI - R_LO)
    kv_mb = 2 * B * S * Hkv * D * 1 / 1e6
    print(f"cap={_BLOCK_CAP} S={S}: {per_call*1e6:.1f} us/call "
          f"({kv_mb/per_call/1e3:.0f} GB/s of {kv_mb:.1f} MB/call)")


if __name__ == "__main__":
    main()
