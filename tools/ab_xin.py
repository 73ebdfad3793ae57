"""A/B the a8s decode kernels on TPU: XLA-prologue fold vs in-kernel xin.

Differenced-reps timing (autotune_a8s methodology): the 8-layer chain runs
inside lax.scan at T and 2T iterations; the difference cancels dispatch /
tunnel latency. Distinct device buffers per layer defeat HBM caching.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from blama_tpu.gguf import GGMLType, quants
from blama_tpu.ops.pallas.quant_matmul import (QuantTensorA8S, repack_q4k_a8s,
                                               w4a8_swar_fold, w4a8_swar_xin)

rng = np.random.default_rng(0)
shapes = [(4096, 6144, "wqkv"), (4096, 4096, "wo"), (4096, 28672, "wgu"),
          (14336, 4096, "down")]
NL = 8


def timed(fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


for K, N, name in shapes:
    wf = (rng.standard_normal((N, K)).astype(np.float32) * 0.05)
    w0 = repack_q4k_a8s(quants.quantize(wf, GGMLType.Q4_K), N, K)
    # distinct RANDOM bytes per copy: identical closed-over constants get
    # deduplicated by XLA (measured an impossible 2.4 TB/s), and codes
    # content doesn't affect streaming time
    ws = [QuantTensorA8S(
              jnp.asarray(rng.integers(0, 255, w0.codes.shape, dtype=np.uint8)),
              jnp.asarray(rng.standard_normal(w0.scales.shape).astype(np.float32)).astype(w0.scales.dtype),
              jnp.asarray(rng.standard_normal(w0.mins.shape).astype(np.float32)).astype(w0.mins.dtype),
              n_out=w0.n_out)
          for _ in range(NL)]
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    yf = np.asarray(w4a8_swar_fold(x, ws[0]))
    yx = np.asarray(w4a8_swar_xin(x, ws[0]))
    bit = np.array_equal(yf, yx)
    rel = np.abs(yf - yx).max() / (np.abs(yf).max() + 1e-9)

    def mk(fn, T, ws=tuple(ws)):
        @jax.jit
        def loop(x):
            def body(carry, _):
                acc = jnp.float32(0)
                xd = x * (1.0 + carry * 1e-30)  # serialize iterations
                for w in ws:
                    acc = acc + fn(xd, w).sum()
                return acc, ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=T)
            return acc
        return loop

    T = 24
    for nm, fn in (("fold", w4a8_swar_fold), ("xin", w4a8_swar_xin)):
        t1 = timed(mk(fn, T), x)
        t2 = timed(mk(fn, 2 * T), x)
        per = (t2 - t1) / T / NL * 1e6
        gbs = (K * N // 2 + K // 32 * N * 2 * 2) / (per / 1e6) / 1e9
        print(f"{name:5s} {nm:4s} {per:8.1f} us/call {gbs:7.0f} GB/s  "
              f"bit={bit} rel={rel:.2e}")
