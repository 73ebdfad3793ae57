"""Establish the real achievable HBM streaming ceiling on this chip.

VERDICT r1 weak #2: decode at 102.3 tok/s x 5 GB model = ~514 GB/s effective,
which is ~63% of v5e's ~819 GB/s spec. Is the gap kernel-side or platform?

Methodology: every measurement is ONE dispatch making ONE pass over a
multi-GB operand set where every iteration reads DIFFERENT data (a scan over
chunks / distinct per-layer weights), so XLA cannot hoist or CSE the reads —
earlier fori_loop-over-same-data designs measured loop-invariant code motion
(510 TB/s "bandwidth"). Dispatch overhead (tunnel ~1-3 ms) is measured with
an empty jit and subtracted.

  1. XLA sum-reduction over a ~6 GB array, chunk-scanned   (pure read)
  2. XLA bf16 decode-shaped matmul chain x[1,K] @ W_l[K,N], 48 layers
  3. the q4k_a8 fused kernel over 64 DISTINCT 8B-FFN-shaped layers
"""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, reps=5):
    # np.asarray forces a device→host transfer: on the tunneled axon platform
    # block_until_ready alone does not reliably wait (see bench.py)
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def dispatch_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x))
    dt = _timeit(f, x, reps=10)
    print(f"dispatch overhead: {dt*1e3:.2f} ms")
    return dt


def probe_read_bw(t_disp, dtype=jnp.bfloat16, gb=6.0):
    """Chunk-scanned sum over a `gb` array: one pass, no reuse."""
    chunk_rows, cols, = 4096, 512
    bytes_per_chunk = chunk_rows * cols * jnp.dtype(dtype).itemsize
    C = int(gb * 1e9 / bytes_per_chunk)
    x = jnp.ones((C, chunk_rows, cols), dtype)

    @jax.jit
    def run(x):
        def body(acc, c):
            return acc + jnp.sum(c, dtype=jnp.float32), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), x)
        return acc

    dt = _timeit(run, x) - t_disp
    bw = x.nbytes / dt / 1e9
    print(f"read-bw {jnp.dtype(dtype).name:8s} {x.nbytes/1e9:5.2f} GB  "
          f"{dt*1e3:7.2f} ms/pass  {bw:6.1f} GB/s")
    return bw


def probe_matmul_bw(t_disp, dtype=jnp.bfloat16, K=4096, N=14336, L=48):
    """Decode-shaped chain: x[1,K] @ W_l[K,N], every layer distinct."""
    w = jnp.ones((L, K, N), dtype)
    x0 = jnp.ones((1, K), dtype)

    @jax.jit
    def run(w, x0):
        def layer(c, wl):
            y = jnp.dot(c, wl, preferred_element_type=jnp.float32)
            return c, jnp.sum(y)
        _, sums = jax.lax.scan(layer, x0, w)
        return jnp.sum(sums)

    dt = _timeit(run, w, x0) - t_disp
    bw = w.nbytes / dt / 1e9
    print(f"matmul-bw {jnp.dtype(dtype).name:8s} {w.nbytes/1e9:5.2f} GB  "
          f"{dt*1e3:7.2f} ms/pass  {bw:6.1f} GB/s")
    return bw


def probe_q4k_kernel(t_disp, K=4096, N=14336, L=64):
    """The production q4k_a8 fused matmul over L DISTINCT layer tensors
    (distinct codes so XLA cannot CSE the pallas calls)."""
    from blama_tpu.gguf.quants import quantize_q4_k
    from blama_tpu.ops.pallas.quant_matmul import (
        QuantTensorA8S, repack_q4k_a8s, w4a8_swar_matmul,
    )

    rng = np.random.default_rng(0)
    wf = rng.normal(size=(N, K)).astype(np.float32)
    data = np.frombuffer(quantize_q4_k(wf), np.uint8)
    w = repack_q4k_a8s(data, N, K)
    ws = [QuantTensorA8S(w.codes + np.uint8(l), w.scales, w.mins, n_out=N)
          for l in range(L)]
    x0 = jnp.ones((1, K), jnp.float32)
    layer_bytes = w.codes.nbytes + w.scales.nbytes + w.mins.nbytes

    @jax.jit
    def run(ws, x0):
        s = jnp.float32(0)
        for wl in ws:  # unrolled like the serving path
            y = w4a8_swar_matmul(x0, wl)
            s = s + jnp.sum(y)
        return s

    dt = _timeit(run, ws, x0) - t_disp
    bw = layer_bytes * L / dt / 1e9
    print(f"q4k_a8 kernel ({K}x{N})x{L}  {layer_bytes*L/1e9:5.2f} GB  "
          f"{dt*1e3:7.2f} ms/pass  {bw:6.1f} GB/s")
    return bw


def main():
    print("device:", jax.devices())
    t_disp = dispatch_overhead()
    probe_read_bw(t_disp, jnp.bfloat16, 6.0)
    probe_read_bw(t_disp, jnp.uint8, 6.0)
    probe_matmul_bw(t_disp)
    probe_q4k_kernel(t_disp)


if __name__ == "__main__":
    main()
