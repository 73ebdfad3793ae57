"""Autotune the a8s (SWAR W4A8) decode kernel per 8B matmul shape.

VERDICT r2 weak #2: the decode step's per-shape kernel efficiency is uneven
(wq/wo 610, down 625 vs ffn 708 GB/s at the default block_n=2048/kb=4), and
the min correction runs as a separate XLA dot per matmul. This sweeps
(block_n, kb, fold-min-in-kernel) per production shape.

Methodology: the tunnel adds ~24 ms of dispatch overhead per call, far above
a single layer set's kernel time, so each config is timed as a lax.scan of
R_HI vs R_LO repetitions over L distinct HBM-resident weight copies (x is
perturbed per rep through a dependency chain, so nothing is CSE'd or
reordered) and the two wall times are DIFFERENCED — dispatch overhead and
ramp cancel exactly, leaving (R_HI-R_LO)·L kernel invocations.

Usage: python -m blama_tpu.tools.autotune_a8s [B]
"""
import gc
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

from blama_tpu.ops.pallas.quant_matmul import (
    GROUP, KT, QuantTensorA8S, _a8s_tpb_call, w4a8_swar_matmul)

# production decode shapes at llama3-8b geometry (fuse_proj layout + head)
SHAPES = {
    "wqkv": (4096, 6144),
    "wo": (4096, 4096),
    "wgu": (4096, 28672),
    "down": (14336, 4096),
    "head": (4096, 129024),
}
R_LO, R_HI = 2, 26


def fake_a8s(K: int, N: int, rng) -> QuantTensorA8S:
    codes = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
    scales = jnp.asarray(rng.standard_normal((K // GROUP, N)).astype(np.float32) * 0.01,
                         jnp.bfloat16)
    mins = jnp.asarray(rng.standard_normal((K // GROUP, N)).astype(np.float32) * 0.01,
                       jnp.bfloat16)
    return QuantTensorA8S(codes, scales, mins, n_out=N)


def _timeit(fn, *args, reps=6):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def make_run(call, R):
    @jax.jit
    def run(x0, *ws):
        def body(x, _):
            acc = jnp.float32(0)
            for w in ws:
                y = call(x, w)
                acc = acc + y[0, 0]
            # per-rep x perturbation: dependency chain defeats CSE/hoisting
            return x + acc * jnp.float32(1e-30), ()
        x, _ = jax.lax.scan(body, x0, None, length=R)
        return x[0, :8]
    return run


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.default_rng(0)
    only = os.environ.get("BLAMA_TUNE_SHAPES")
    shapes = {k: v for k, v in SHAPES.items()
              if only is None or k in only.split(",")}

    for name, (K, N) in shapes.items():
        bytes_w = K * N // 2 + 2 * (K // GROUP) * N * 2
        L = max(2, min(16, int(1.2e9 / bytes_w)))
        ws = [fake_a8s(K, N, rng) for _ in range(L)]
        x = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
        print(f"== {name} K={K} N={N}  ({bytes_w/1e6:.0f} MB/layer, {L} layers)",
              flush=True)
        rows = []
        nsb = K // KT
        for bn in tuple(int(v) for v in os.environ.get('BLAMA_TUNE_BN', '1024,2048,4096').split(',')):
            if bn > N:
                continue
            for kb in (4, 8):
                if nsb % kb != 0:
                    continue
                for fold in ((1,) if os.environ.get('BLAMA_TUNE_FOLD1') else (0, 1)):
                    if fold:
                        call = (lambda x, w, bn=bn, kb=kb:
                                _a8s_tpb_call(x, w, 0, bn, kb))
                    else:
                        call = (lambda x, w, bn=bn, kb=kb:
                                w4a8_swar_matmul(x, w, bn, kb))
                    try:
                        t_hi = _timeit(make_run(call, R_HI), x, *ws)
                        t_lo = _timeit(make_run(call, R_LO), x, *ws)
                        dt = (t_hi - t_lo) / ((R_HI - R_LO) * L)
                        bw = bytes_w / dt / 1e9
                        rows.append((dt, bn, kb, fold, bw))
                        print(f"  bn={bn:5d} kb={kb:2d} fold={fold}  "
                              f"{dt*1e3:7.3f} ms  {bw:6.1f} GB/s", flush=True)
                    except Exception as e:
                        print(f"  bn={bn:5d} kb={kb:2d} fold={fold}  FAIL "
                              f"{type(e).__name__}: {str(e)[:90]}", flush=True)
        if rows:
            rows.sort()
            dt, bn, kb, fold, bw = rows[0]
            print(f"  BEST {name}: bn={bn} kb={kb} fold={fold}  "
                  f"{dt*1e3:.3f} ms {bw:.1f} GB/s", flush=True)
        del ws
        gc.collect()


if __name__ == "__main__":
    main()
