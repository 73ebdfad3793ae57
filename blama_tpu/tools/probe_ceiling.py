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


def _timeit_reps(build_run, r1=4, r2=12):
    """Per-iteration time via paired rep counts: (t(r2) - t(r1)) / (r2 - r1)
    cancels dispatch overhead and its jitter exactly. build_run(reps) returns
    a 0-arg jitted thunk whose loop carries a value dependency (s * 1e-30
    added to x) so XLA cannot hoist iterations."""
    f1, f2 = build_run(r1), build_run(r2)
    t1, t2 = _timeit(f1), _timeit(f2)
    return (t2 - t1) / (r2 - r1)


def probe_q4k_shapes(t_disp=None):
    """Per-projection kernel bandwidth at 8B geometry: which tile shapes
    stream below the FFN tiles' rate?"""
    from blama_tpu.gguf.quants import quantize_q4_k
    from blama_tpu.ops.pallas.quant_matmul import (
        QuantTensorA8S, repack_q4k_a8s, w4a8_swar_matmul,
    )

    rng = np.random.default_rng(0)
    shapes = {
        "wq/wo   4096x4096": (4096, 4096, 16),
        "wkv     4096x1024": (4096, 1024, 16),
        "ffn    4096x14336": (4096, 14336, 16),
        "down   14336x4096": (14336, 4096, 16),
        "head  4096x128256": (4096, 128256, 4),
    }
    for name, (K, N, L) in shapes.items():
        wf = rng.normal(size=(min(N, 4096), K)).astype(np.float32)
        data = np.frombuffer(quantize_q4_k(wf), np.uint8)
        w0 = repack_q4k_a8s(data, min(N, 4096), K)
        if N > 4096:  # tile up columns to the true width
            reps = -(-N // 4096)
            codes = jnp.tile(w0.codes, (1, reps))[:, : -(-N // 256) * 256]
            scales = jnp.tile(w0.scales, (1, reps))[:, : codes.shape[1]]
            mins = jnp.tile(w0.mins, (1, reps))[:, : codes.shape[1]]
            w0 = QuantTensorA8S(codes, scales, mins, n_out=N)
        ws = [QuantTensorA8S(w0.codes + np.uint8(l), w0.scales, w0.mins,
                             n_out=w0.n_out) for l in range(L)]
        x0 = jnp.ones((1, K), jnp.float32)
        layer_bytes = w0.codes.nbytes + w0.scales.nbytes + w0.mins.nbytes

        def build_run(reps, ws=ws, x0=x0, L=L):
            @jax.jit
            def run(ws, x0):
                def it(i, s):
                    xi = x0 + s * 1e-30   # loop-carried dep: no hoisting
                    acc = jnp.float32(0)
                    for wl in ws:
                        acc = acc + jnp.sum(w4a8_swar_matmul(xi, wl))
                    return s + acc
                return jax.lax.fori_loop(0, reps, it, jnp.float32(0))
            return lambda: run(ws, x0)

        dt = _timeit_reps(build_run) / L
        bw = layer_bytes / dt / 1e9
        print(f"q4k_a8 {name}: {dt*1e3:7.3f} ms/call  {bw:6.1f} GB/s"
              f"  ({layer_bytes/1e6:.1f} MB)")


def probe_decode_attention(t_disp=None, S=2048, B=1, H=32, Hkv=8, D=128, L=8,
                           kv_int8=False):
    """Fused decode-attention kernel cost per step at cache length S."""
    from blama_tpu.ops.kv_cache import quantize_kv
    from blama_tpu.ops.pallas.decode_attention import (
        decode_attention, effective_inv_freq,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    kvs = []
    for _ in range(L):
        k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
        if kv_int8:
            kc, ksc = quantize_kv(k)
            vc, vsc = quantize_kv(v)
            kvs.append((kc, vc, ksc, vsc))
        else:
            kvs.append((k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                        None, None))
    kv_pos = jnp.tile(jnp.arange(S, dtype=jnp.int32), (B, 1))
    q_pos = jnp.full((B,), S - 1, jnp.int32)
    invf, ms = effective_inv_freq(D, D, 500000.0)

    def build_run(reps):
        @jax.jit
        def run(kvs, q):
            def it(i, s):
                qi = q + (s * 1e-30).astype(q.dtype)
                acc = jnp.float32(0)
                for k, v, ksc, vsc in kvs:
                    o = decode_attention(qi, k, v, q_pos, kv_pos, invf,
                                         k_scale=ksc, v_scale=vsc, mscale=ms)
                    acc = acc + jnp.sum(o.astype(jnp.float32))
                return s + acc
            return jax.lax.fori_loop(0, reps, it, jnp.float32(0))
        return lambda: run(kvs, q)

    dt = _timeit_reps(build_run) / L
    layer_bytes = kvs[0][0].nbytes * 2
    tag = "int8" if kv_int8 else "bf16"
    print(f"decode-attn S={S} kv={tag}: {dt*1e3:7.3f} ms/layer  "
          f"{layer_bytes/dt/1e9:6.1f} GB/s  ({layer_bytes/1e6:.1f} MB)")
