"""A/B microbench: a8s (5 b/w prod) vs a8k4 (4.5 b/w) vs X2 variant.

X2 = a8s kernel body (big lo/hi plane sums, (t,g) plane order) with the
native-layout 6-bit scale decode done ONCE per block via jnp.stack, and the
mins term folded into the same accumulation. Tests whether a8k4's per-j
slab loop / g-major layout is what loses to a8s, or the decode itself.

Usage: python tools/ab_a8k4.py [K N B]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from blama_tpu.ops.pallas import quant_matmul as qm
from blama_tpu.ops.pallas.quant_matmul import (
    KT, GROUP, _f16_bits_to_f32, _quant_acts, _a8s_planes,
)


def log(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _x2_kernel(planes_lo_ref, planes_hi_ref, xs_ref, xsum_ref, codes_ref,
               ddm_ref, scmn_ref, out_ref):
    ks = pl.program_id(1)
    w32 = pltpu.bitcast(codes_ref[:], jnp.int32)
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
    pl_lo = planes_lo_ref[:]
    pl_hi = planes_hi_ref[:]
    PB = pl_lo.shape[0]
    bn = lo.shape[1]
    kb = lo.shape[0] // (KT // 2)
    P = kb * 4
    B = PB // P
    ip_lo = jax.lax.dot_general(pl_lo, lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    ip_hi = jax.lax.dot_general(pl_hi, hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)

    dd = ddm_ref[:]
    d = _f16_bits_to_f32(dd & 0xFFFF)
    dmin = _f16_bits_to_f32((dd >> 16) & 0xFFFF)
    w012 = scmn_ref[:].reshape(kb, 3, bn)
    w0, w1, w2 = w012[:, 0], w012[:, 1], w012[:, 2]
    scs, mns = [], []
    for j in range(8):
        if j < 4:
            sc = (w0 >> (8 * j)) & 63
            mn = (w1 >> (8 * j)) & 63
        else:
            i = j - 4
            sc = ((w2 >> (8 * i)) & 0xF) | (((w0 >> (8 * i + 6)) & 3) << 4)
            mn = ((w2 >> (8 * i + 4)) & 0xF) | (((w1 >> (8 * i + 6)) & 3) << 4)
        scs.append(d * sc.astype(jnp.float32))
        mns.append(dmin * mn.astype(jnp.float32))
    ws = jnp.stack(scs, axis=1)   # [kb, 8, bn]
    wm = jnp.stack(mns, axis=1)

    xs = xs_ref[:].astype(jnp.float32).reshape(kb, 8, B)      # (t,g) order
    sx = (xs_ref[:] * xsum_ref[:]).astype(jnp.float32).reshape(kb, 8, B)
    acc = jnp.sum(ip_lo.astype(jnp.float32).reshape(P, B, bn)
                  * ws[:, :4].reshape(P, 1, bn) * xs[:, :4].reshape(P, B, 1)
                  - wm[:, :4].reshape(P, 1, bn) * sx[:, :4].reshape(P, B, 1),
                  axis=0)
    acc += jnp.sum(ip_hi.astype(jnp.float32).reshape(P, B, bn)
                   * ws[:, 4:].reshape(P, 1, bn) * xs[:, 4:].reshape(P, B, 1)
                   - wm[:, 4:].reshape(P, 1, bn) * sx[:, 4:].reshape(P, B, 1),
                   axis=0)

    @pl.when(ks == 0)
    def _():
        out_ref[:] = acc

    @pl.when(ks != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@partial(jax.jit, static_argnums=(4, 5))
def x2_matmul(x, codes, ddm, scmn, block_n=2048, kb=8):
    B, K = x.shape
    K2, N = codes.shape
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    nsb = K // KT
    kb = min(kb, nsb)
    while kb > 1 and nsb % kb != 0:
        kb //= 2
    if kb % 8 != 0 and kb != nsb:
        kb = nsb
    slab = kb * KT
    P = kb * 4
    xq, xsT, xsumT = _quant_acts(x)
    p_lo, p_hi = _a8s_planes(xq, kb)
    grid = (N // bn, K // slab)
    return pl.pallas_call(
        _x2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, B), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, B), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // 2, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * kb, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * B * (K // 2) * N,
            bytes_accessed=K * N // 2 + (K // KT) * N * 16 + P * B * K + B * N * 4,
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(p_lo, p_hi, xsT, xsumT, codes, ddm, scmn)


def unrolled_runner(step, weights_list, x0, reps):
    @jax.jit
    def run(x0, ws):
        def outer(x, _):
            for wl in ws:
                y = step(x, wl)
                x = x + (y[:, : x.shape[1]] * 1e-12).astype(x.dtype)
            return x, ()
        x, _ = jax.lax.scan(outer, x0, None, length=reps)
        return x
    return run


def timed(fn, x0, ws, n, label):
    t0 = time.perf_counter()
    np.asarray(fn(x0, ws))
    log(f"{label}: compile+first {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(x0, ws))
        ts.append((time.perf_counter() - t0) / n)
    return min(ts)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    L, reps = 8, 40
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K), dtype=np.float32))

    # build L weight copies in each layout from the same synthetic Q4_K bytes
    from blama_tpu.gguf.quants import quantize_q4_k
    ws_a8s, ws_a8k4 = [], []
    for l in range(L):
        wf = (rng.standard_normal((N, K)) * 0.05).astype(np.float32)
        data = quantize_q4_k(wf)
        ws_a8s.append(qm.repack_q4k_a8s(data, N, K))
        k4 = qm.repack_q4k_a8k4(data, N, K)
        ws_a8k4.append(k4)
    ws_x2 = [(w.codes, w.ddm, w.scmn) for w in ws_a8k4]

    bytes_a8s = K * N // 2 + 2 * (K // 32) * N * 2
    bytes_k4 = K * N // 2 + (K // KT) * N * 16

    # correctness: X2 vs a8k4 (same numerics) on layer 0
    y_ref = np.asarray(qm.a8k4_matmul(x0, ws_a8k4[0]))
    y_x2 = np.asarray(x2_matmul(x0, *ws_x2[0]))
    rel = np.max(np.abs(y_x2 - y_ref)) / (np.max(np.abs(y_ref)) + 1e-9)
    print(f"correctness x2 vs a8k4: {rel:.2e}")

    n = L * reps
    t = timed(unrolled_runner(lambda x, w: qm.w4a8_swar_matmul(x, w), ws_a8s, x0, reps),
              x0, ws_a8s, n, "a8s")
    print(f"a8s  (5.0 b/w prod)   {t*1e3:7.3f} ms  {bytes_a8s/t/1e9:6.1f} GB/s eff")
    t = timed(unrolled_runner(lambda x, w: qm.a8k4_matmul(x, w), ws_a8k4, x0, reps),
              x0, ws_a8k4, n, "a8k4")
    print(f"a8k4 (4.5 b/w, per-j) {t*1e3:7.3f} ms  {bytes_k4/t/1e9:6.1f} GB/s eff")
    t = timed(unrolled_runner(lambda x, w: x2_matmul(x, *w), ws_x2, x0, reps),
              x0, ws_x2, n, "x2")
    print(f"x2   (4.5 b/w, stack) {t*1e3:7.3f} ms  {bytes_k4/t/1e9:6.1f} GB/s eff")


if __name__ == "__main__":
    main()
