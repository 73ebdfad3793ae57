"""Per-shape (block_n, kb) sweep for the SWAR W4A8 kernel on real TPU.

Round-2 profiling (NEXT.md perf #1) showed per-shape kernel efficiency
spread: at 8B geometry wq/wo stream ~610 GB/s and down ~625 GB/s while the
wide gate+up projection reaches ~708 GB/s with the same default
(block_n=2048, kb=4). This sweeps the grid knobs per weight shape so the
dispatch table (quant_matmul.A8S_TUNE) can pin the best measured config.

Usage:  python -m blama_tpu.tools.autotune_a8s [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.quants import quantize_q4_k
from ..ops.pallas import quant_matmul as qm


def _pack(K: int, N: int) -> qm.QuantTensorA8S:
    rng = np.random.default_rng(0)
    w = rng.standard_normal((N, K), dtype=np.float32) * 0.02
    data = quantize_q4_k(w)
    return qm.repack_q4k_a8s(data, N, K)


N_SHORT, N_LONG = 64, 512


def _time(w, xs, bn, kb):
    """Seconds per kernel call via a two-length slope: device-side scans over
    N_SHORT and N_LONG distinct activations (loop-carried scalar dependency —
    nothing can be hoisted or elided); the difference cancels the ~23 ms
    fixed tunnel-dispatch cost that would otherwise swamp sub-ms kernels."""
    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def loop(w, xs, bn, kb):
        def body(acc, x):
            y = qm.w4a8_swar_matmul(x, w, bn, kb)
            return acc + y.sum(), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    def best_of(n, reps=3):
        xn = xs[:n]
        np.asarray(loop(w, xn, bn, kb))  # compile+settle
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(w, xn, bn, kb))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(N_LONG) - best_of(N_SHORT)) / (N_LONG - N_SHORT)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    # 8B-geometry shapes (K, N): qkv fused, attn out, gate+up fused, down,
    # plus the lm head at 128k vocab.
    shapes = {
        "wqkv": (4096, 6144),
        "wo": (4096, 4096),
        "wgu": (4096, 28672),
        "down": (14336, 4096),
        "head": (4096, 16384),  # head proxy: N-blocked slice of 128k vocab
    }
    results = {}
    for name, (K, N) in shapes.items():
        w = _pack(K, N)
        xs = jnp.asarray(np.random.default_rng(1).standard_normal(
            (N_LONG, B, K)), jnp.bfloat16)
        bytes_w = K * N // 2 + (K // 32) * N * 4  # codes + bf16 scales+mins
        best = None
        for kb in (2, 4, 8, 16):
            if K % (kb * 256):
                continue
            for bn in (512, 1024, 2048, 4096, 8192):
                if bn > N:
                    continue
                try:
                    t = _time(w, xs, bn, kb)
                except Exception as e:  # VMEM overflow etc.
                    print(f"{name} kb={kb} bn={bn}: FAIL {type(e).__name__}")
                    continue
                gbs = bytes_w / t / 1e9
                tag = ""
                if best is None or t < best[0]:
                    best = (t, kb, bn)
                    tag = " <-- best"
                print(f"{name} [{K}x{N}] kb={kb} bn={bn}: "
                      f"{t*1e3:.3f} ms  {gbs:.0f} GB/s{tag}")
        t, kb, bn = best
        results[name] = (K, N, kb, bn, bytes_w / t / 1e9)
        print(f"== {name}: kb={kb} bn={bn}  {bytes_w/t/1e9:.0f} GB/s\n")

    print("A8S_TUNE = {")
    for name, (K, N, kb, bn, gbs) in results.items():
        print(f"    ({K}, {N}): ({bn}, {kb}),   # {name}: {gbs:.0f} GB/s")
    print("}")


if __name__ == "__main__":
    main()
