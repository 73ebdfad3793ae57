"""Microbenchmark for Q4_K dequant-matmul kernel variants on real TPU.

Times each variant as a scan over L distinct weight copies (the real decode
memory pattern: every layer's weights stream from HBM exactly once, no cache
reuse), inside a single jit to amortize the axon tunnel dispatch overhead.

Usage: python -m blama_tpu.tools.ubench_q4k [K N [B]]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from ..ops.pallas import quant_matmul as qm


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KT, GROUP = qm.KT, qm.GROUP
G = KT // GROUP


# --------------------------------------------------------------------------
# v1: f32 unpack but no concat — lo/hi halves get separate dots
# --------------------------------------------------------------------------
def _v1_kernel(x_ref, codes_ref, scales_ref, out_ref):
    k = pl.program_id(1)
    codes = codes_ref[:].astype(jnp.int32)      # [kb*128, nt]
    nt = codes.shape[1]
    kb = codes.shape[0] // (KT // 2)
    cs = codes.reshape(kb, KT // 2, nt)
    sc = scales_ref[:].astype(jnp.float32).reshape(kb, 8, nt)
    lo = (cs & 0xF).astype(jnp.float32).reshape(kb * 4, GROUP, nt)
    hi = (cs >> 4).astype(jnp.float32).reshape(kb * 4, GROUP, nt)
    w_lo = (lo * sc[:, :4].reshape(kb * 4, 1, nt)).reshape(kb * KT // 2, nt)
    w_hi = (hi * sc[:, 4:].reshape(kb * 4, 1, nt)).reshape(kb * KT // 2, nt)
    x = x_ref[:].astype(jnp.float32)            # [B, kb*KT]
    xs = x.reshape(x.shape[0], kb, 2, KT // 2)
    x_lo = xs[:, :, 0].reshape(x.shape[0], kb * KT // 2)
    x_hi = xs[:, :, 1].reshape(x.shape[0], kb * KT // 2)
    partial_out = (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == 0)
    def _():
        out_ref[:] = partial_out

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + partial_out


@partial(jax.jit, static_argnums=(4, 5))
def q4k_matmul_v1(x, codes, scales, mins, block_n=4096, kb=8):
    B, K = x.shape
    N = codes.shape[1]
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    kt_blk = kb * KT
    grid = (N // bn, K // kt_blk)
    pos = pl.pallas_call(
        _v1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, kt_blk), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // 2, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // GROUP, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N // 2 + K * N // 4 + B * K * 4 + B * N * 4,
            transcendentals=0),
    )(x, codes, scales)
    xg_sum = jnp.sum(x.astype(jnp.float32).reshape(B, K // GROUP, GROUP), axis=-1)
    return pos - jnp.dot(xg_sum, mins.astype(jnp.float32),
                         preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# v2 / v3: int8 plane dot on the MXU
# --------------------------------------------------------------------------
def _plane_combine(acc, ip, ws_t, xs_t, B, nt):
    ipf = ip.astype(jnp.float32).reshape(G, B, nt)
    term = jnp.sum(ipf * ws_t[:, None, :] * xs_t[:, :, None], axis=0)
    return acc + term


def _v2_kernel(planes_ref, xs_ref, codes_ref, scales_ref, out_ref):
    k = pl.program_id(1)
    q = codes_ref[:]                              # i8 [kb*KT, nt]
    planes = planes_ref[:]                        # i8 [G*B, kb*KT]
    xs = xs_ref[:].astype(jnp.float32)            # [kb*G, B]
    ws = scales_ref[:].astype(jnp.float32)        # [kb*G, nt]
    nt = q.shape[1]
    kb = q.shape[0] // KT
    B = planes.shape[0] // G
    acc = jnp.zeros((B, nt), jnp.float32)
    for t in range(kb):
        ip = jax.lax.dot_general(
            planes[:, t * KT:(t + 1) * KT], q[t * KT:(t + 1) * KT, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = _plane_combine(acc, ip, ws[t * G:(t + 1) * G, :],
                             xs[t * G:(t + 1) * G, :], B, nt)

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _v3_kernel(planes_ref, xs_ref, codes_ref, scales_ref, out_ref):
    k = pl.program_id(1)
    c = codes_ref[:].astype(jnp.int32)            # [kb*KT/2, nt]
    nt = c.shape[1]
    kb = c.shape[0] // (KT // 2)
    cs = c.reshape(kb, KT // 2, nt)
    lo = (cs & 0xF).astype(jnp.int8)
    hi = (cs >> 4).astype(jnp.int8)
    q = jnp.concatenate([lo, hi], axis=1).reshape(kb * KT, nt)
    planes = planes_ref[:]
    xs = xs_ref[:].astype(jnp.float32)
    ws = scales_ref[:].astype(jnp.float32)
    B = planes.shape[0] // G
    acc = jnp.zeros((B, nt), jnp.float32)
    for t in range(kb):
        ip = jax.lax.dot_general(
            planes[:, t * KT:(t + 1) * KT], q[t * KT:(t + 1) * KT, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = _plane_combine(acc, ip, ws[t * G:(t + 1) * G, :],
                             xs[t * G:(t + 1) * G, :], B, nt)

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _plane_call(kernel, planes, xsT, codes, scales, B, K, N, bn, kb, packed):
    kt_blk = kb * KT
    grid = (N // bn, K // kt_blk)
    code_rows = kt_blk // 2 if packed else kt_blk
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G * B, kt_blk), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // GROUP, B), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((code_rows, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // GROUP, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * B * K * N,
            bytes_accessed=(K * N // 2 if packed else K * N)
            + (K // GROUP) * N * 2 + G * B * K + B * N * 4,
            transcendentals=0),
    )(planes, xsT, codes, scales)


@partial(jax.jit, static_argnums=(4, 5))
def w4a8_plane_matmul(x, codes_i8, scales, mins, block_n=2048, kb=4):
    B, K = x.shape
    N = codes_i8.shape[1]
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    planes, xsT, xsumT = qm.quantize_activations(x)   # [G*B,K], [K/32,B], [K/32,B]
    pos = _plane_call(_v2_kernel, planes, xsT, codes_i8, scales,
                      B, K, N, bn, kb, packed=False)
    neg = jnp.dot((xsT * xsumT).T, mins.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    return pos - neg


@partial(jax.jit, static_argnums=(4, 5))
def w4a8_packed_matmul(x, codes_packed, scales, mins, block_n=4096, kb=8):
    B, K = x.shape
    N = codes_packed.shape[1]
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    planes, xsT, xsumT = qm.quantize_activations(x)
    pos = _plane_call(_v3_kernel, planes, xsT, codes_packed, scales,
                      B, K, N, bn, kb, packed=True)
    neg = jnp.dot((xsT * xsumT).T, mins.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    return pos - neg


# --------------------------------------------------------------------------
# v6: SWAR nibble unpack + wide int8 plane dots
# --------------------------------------------------------------------------
def _v6_kernel(planes_lo_ref, planes_hi_ref, xs_ref, codes_ref, scales_ref, out_ref):
    ks = pl.program_id(1)
    w32 = pltpu.bitcast(codes_ref[:], jnp.int32)        # [kb*32, bn]
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)      # [kb*128, bn]
    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
    pl_lo = planes_lo_ref[:]                            # i8 [P*B, kb*128]
    pl_hi = planes_hi_ref[:]
    PB = pl_lo.shape[0]
    bn = lo.shape[1]
    kb = lo.shape[0] // 128
    P = kb * 4
    B = PB // P
    ip_lo = jax.lax.dot_general(pl_lo, lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    ip_hi = jax.lax.dot_general(pl_hi, hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    ws = scales_ref[:].astype(jnp.float32).reshape(kb, 8, bn)
    xs = xs_ref[:].astype(jnp.float32).reshape(kb, 8, B)
    ws_lo = ws[:, :4].reshape(P, 1, bn)
    ws_hi = ws[:, 4:].reshape(P, 1, bn)
    xs_lo = xs[:, :4].reshape(P, B, 1)
    xs_hi = xs[:, 4:].reshape(P, B, 1)
    acc = jnp.sum(ip_lo.astype(jnp.float32).reshape(P, B, bn) * ws_lo * xs_lo, axis=0)
    acc += jnp.sum(ip_hi.astype(jnp.float32).reshape(P, B, bn) * ws_hi * xs_hi, axis=0)

    @pl.when(ks == 0)
    def _():
        out_ref[:] = acc

    @pl.when(ks != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _quant_acts(x):
    """[B, K] float → (xq i8 [B, K], xs [K/32, B], xsum [K/32, B])."""
    B, K = x.shape
    xg = x.astype(jnp.float32).reshape(B, K // GROUP, GROUP)
    amax = jnp.max(jnp.abs(xg), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    xqg = jnp.round(xg * inv[..., None]).astype(jnp.int8)
    xsum = jnp.sum(xqg.astype(jnp.int32), axis=-1).astype(jnp.float32)
    return xqg.reshape(B, K), scale.T, xsum.T


def _v6_planes(xq, kb):
    """xq [B, K] i8 → (planes_lo, planes_hi) [4*kb*B, K/2] i8."""
    B, K = xq.shape
    slab = kb * qm.KT
    ns = K // slab
    xr = xq.reshape(B, ns, kb, 2, 128)
    x_lo = xr[:, :, :, 0].reshape(B, K // 2)
    x_hi = xr[:, :, :, 1].reshape(B, K // 2)
    P = kb * 4
    i = jnp.arange(K // 2) % (kb * 128)
    p_of_i = (i // 128) * 4 + (i % 128) // 32          # [K/2]
    def mk(xh):
        return jnp.concatenate(
            [jnp.where(p_of_i[None, :] == p, xh, jnp.int8(0)) for p in range(P)],
            axis=0)
    return mk(x_lo), mk(x_hi)


@partial(jax.jit, static_argnums=(4, 5))
def w4a8_swar_matmul(x, codes_packed, scales, mins, block_n=2048, kb=8):
    B, K = x.shape
    N = codes_packed.shape[1]
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    while K % (kb * qm.KT) != 0:
        kb //= 2
    slab = kb * qm.KT
    P = kb * 4
    xq, xsT, xsumT = _quant_acts(x)
    p_lo, p_hi = _v6_planes(xq, kb)
    grid = (N // bn, K // slab)
    pos = pl.pallas_call(
        _v6_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, B), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // 2, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * B * (K // 2) * N,
            bytes_accessed=K * N // 2 + (K // GROUP) * N * 2 + P * B * K + B * N * 4,
            transcendentals=0),
    )(p_lo, p_hi, xsT, codes_packed, scales)
    neg = jnp.dot((xsT * xsumT).T, mins.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    return pos - neg


def make_weights(K, N, L, rng):
    """L layers of synthetic Q4_K-style packed data (random codes/scales)."""
    codes = rng.integers(0, 16, (L, K, N), dtype=np.uint8)
    scales = (rng.random((L, K // 32, N), dtype=np.float32) * 0.02 + 0.01)
    mins = (rng.random((L, K // 32, N), dtype=np.float32) * 0.01)
    return codes, scales, mins


def pack_pairs(codes):
    """[L, K, N] u8 → [L, K/2, N] paired (j, j+KT/2) per 256-row tile."""
    L, K, N = codes.shape
    ct = codes.reshape(L, K // qm.KT, 2, qm.KT // 2, N)
    return np.ascontiguousarray((ct[:, :, 0] | (ct[:, :, 1] << 4)).reshape(L, K // 2, N))


def timed(fn, *args, n=20, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force through tunnel
    log(f"{label}: compile+first {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) / n)
    return min(times), out


def run_scan(step, xs_weights, x0, n_iters):
    """scan over L weights, repeated to n_iters total steps."""
    L = jax.tree_util.tree_leaves(xs_weights)[0].shape[0]
    reps = max(1, n_iters // L)

    @jax.jit
    def run(x0, w):
        def outer(x, _):
            def body(x, wl):
                y = step(x, wl)
                # feed a cheap function of y back so iterations serialize
                x2 = x + (y[:, : x.shape[1]] * 1e-12).astype(x.dtype)
                return x2, ()
            x, _ = jax.lax.scan(body, x, w)
            return x, ()
        x, _ = jax.lax.scan(outer, x0, None, length=reps)
        return x

    return run, reps * L


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    L = 16
    rng = np.random.default_rng(0)
    codes_np, scales_np, mins_np = make_weights(K, N, L, rng)
    x0 = jnp.asarray(rng.standard_normal((B, K), dtype=np.float32))

    weight_bytes = {
        "q4k_packed": K * N // 2 + 2 * (K // 32) * N * 4,
        "w4a8_i8": K * N + 2 * (K // 32) * N * 2,
        "bf16": K * N * 2,
    }

    results = {}

    def report(name, per_step, kind):
        gbs = weight_bytes[kind] / per_step / 1e9
        results[name] = (per_step * 1e3, gbs)
        print(f"{name:34s} {per_step*1e3:8.3f} ms/step  {gbs:7.1f} GB/s eff")

    # --- v0: current production kernel -------------------------------------
    packed = jnp.asarray(pack_pairs(codes_np))
    scales = jnp.asarray(scales_np)
    mins = jnp.asarray(mins_np)

    def step_v0(x, wl):
        w = qm.QuantTensor(wl[0], wl[1], wl[2], n_out=N)
        return qm.q4k_matmul(x, w)

    fn, iters = run_scan(step_v0, (packed, scales, mins), x0, 320)
    t, _ = timed(fn, x0, (packed, scales, mins), n=iters, label="v0")
    report("v0 current (f32 unpack+concat)", t, "q4k_packed")

    # --- v1: no-concat two-dot (lo/hi halves dotted separately) -------------
    def step_v1(x, wl):
        return q4k_matmul_v1(x, wl[0], wl[1], wl[2])

    fn, iters = run_scan(step_v1, (packed, scales, mins), x0, 320)
    t, o1 = timed(fn, x0, (packed, scales, mins), n=iters, label="v1")
    report("v1 two-dot no-concat", t, "q4k_packed")

    # --- v2: i8 codes stored (9 b/w), plane dot on MXU ----------------------
    codes_i8 = jnp.asarray(codes_np.astype(np.int8))
    scales_f16 = jnp.asarray(scales_np).astype(jnp.bfloat16)
    mins_f16 = jnp.asarray(mins_np).astype(jnp.bfloat16)

    def step_v2(x, wl):
        return w4a8_plane_matmul(x, wl[0], wl[1], wl[2])

    fn, iters = run_scan(step_v2, (codes_i8, scales_f16, mins_f16), x0, 320)
    t, o2 = timed(fn, x0, (codes_i8, scales_f16, mins_f16), n=iters, label="v2")
    report("v2 i8-stored plane-dot (9 b/w)", t, "w4a8_i8")

    # --- v3: packed 4-bit, unpack->i8 in kernel, plane dot ------------------
    def step_v3(x, wl):
        return w4a8_packed_matmul(x, wl[0], wl[1], wl[2])

    fn, iters = run_scan(step_v3, (packed, scales_f16, mins_f16), x0, 320)
    t, o3 = timed(fn, x0, (packed, scales_f16, mins_f16), n=iters, label="v3")
    report("v3 packed4 unpack->i8 plane-dot", t, "q4k_packed")

    # --- v6: SWAR unpack + wide plane dots -----------------------------------
    def step_v6(x, wl):
        return w4a8_swar_matmul(x, wl[0], wl[1], wl[2])

    fn, iters = run_scan(step_v6, (packed, scales_f16, mins_f16), x0, 320)
    t, _ = timed(fn, x0, (packed, scales_f16, mins_f16), n=iters, label="v6")
    report("v6 SWAR packed4 plane-dot", t, "q4k_packed")

    # --- v4: existing pure-XLA W4A8 ------------------------------------------
    def step_v4(x, wl):
        w = qm.QuantTensorA8(wl[0], wl[1], wl[2], n_out=N)
        return qm.w4a8_matmul(x, w)

    fn, iters = run_scan(step_v4, (codes_i8, scales_f16, mins_f16), x0, 320)
    t, o4 = timed(fn, x0, (codes_i8, scales_f16, mins_f16), n=iters, label="v4")
    report("v4 pure-XLA W4A8 (9 b/w)", t, "w4a8_i8")

    # --- v5: bf16 dense ceiling ---------------------------------------------
    wb = jnp.asarray((codes_np.astype(np.float32) * scales_np.repeat(32, axis=1)
                      - mins_np.repeat(32, axis=1)).astype(jnp.bfloat16))

    def step_bf16(x, wl):
        return jnp.dot(x.astype(jnp.bfloat16), wl, preferred_element_type=jnp.float32)

    fn, iters = run_scan(step_bf16, wb, x0, 320)
    t, _ = timed(fn, x0, wb, n=iters, label="v5")
    report("v5 bf16 dense (XLA)", t, "bf16")

    # correctness spot check (single matmul, layer 0)
    w0 = qm.QuantTensor(packed[0], scales[0], mins[0], n_out=N)
    ref = np.asarray(qm.q4k_matmul(x0, w0))
    for name, f in [
        ("v1", lambda: q4k_matmul_v1(x0, packed[0], scales[0], mins[0])),
        ("v2", lambda: w4a8_plane_matmul(x0, codes_i8[0], scales_f16[0], mins_f16[0])),
        ("v3", lambda: w4a8_packed_matmul(x0, packed[0], scales_f16[0], mins_f16[0])),
        ("v6", lambda: w4a8_swar_matmul(x0, packed[0], scales_f16[0], mins_f16[0])),
        ("v4", lambda: qm.w4a8_matmul(x0, qm.QuantTensorA8(
            codes_i8[0], scales_f16[0], mins_f16[0], n_out=N))),
    ]:
        try:
            out = np.asarray(f())
            rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"correctness {name}: max rel err vs v0 = {rel:.2e}")
        except Exception as e:
            print(f"correctness {name}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
