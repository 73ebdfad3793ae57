"""Measure per-op / per-kernel-dispatch fixed costs inside one XLA program.

The 8B decode step carries ~2 ms of non-weight time (profile_step). Candidate
sinks: (a) small XLA fusions between Pallas calls (norm/quantize/planes/rope
chains), (b) fixed per-pallas_call dispatch cost, (c) cache-update
dynamic-update-slices. Each probe times a scan of N-long chains so the cost
per element is (t(N_hi) - t(N_lo)) / (R * (N_hi - N_lo)) — tunnel dispatch
overhead cancels.

Usage: python -m blama_tpu.tools.probe_overhead
"""
import os
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 32


def _timeit(fn, *args, reps=6):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chain_cost(mk_chain, n_lo=8, n_hi=64):
    f_hi = mk_chain(n_hi)
    f_lo = mk_chain(n_lo)
    t_hi = _timeit(f_hi)
    t_lo = _timeit(f_lo)
    return (t_hi - t_lo) / (R * (n_hi - n_lo))


def probe_xla_elementwise():
    """Chain of unfuseable-by-value elementwise ops on a [1, 4096] f32."""
    x0 = jnp.ones((1, 4096), jnp.float32)

    def mk(n):
        @jax.jit
        def run():
            def body(x, _):
                for i in range(n):
                    # rsqrt forces a real op; +i defeats CSE
                    x = jax.lax.rsqrt(jnp.abs(x) + jnp.float32(1.0 + i * 1e-6))
                return x, ()
            x, _ = jax.lax.scan(body, x0, None, length=R)
            return x[0, :8]
        return run
    print(f"xla elementwise op [1,4096]:   {chain_cost(mk)*1e6:7.2f} us/op")


def probe_xla_reduce():
    """Chain of row reductions (norm-like) on [1, 4096]."""
    x0 = jnp.ones((1, 4096), jnp.float32)

    def mk(n):
        @jax.jit
        def run():
            def body(x, _):
                for i in range(n):
                    m = jnp.mean(x * x, axis=-1, keepdims=True)
                    x = x * jax.lax.rsqrt(m + jnp.float32(1e-5 + i * 1e-9))
                return x, ()
            x, _ = jax.lax.scan(body, x0, None, length=R)
            return x[0, :8]
        return run
    print(f"xla norm (reduce+scale):       {chain_cost(mk)*1e6:7.2f} us/op")


def probe_dus():
    """Chain of cache-like dynamic-update-slices [32,1,512,8,128] bf16."""
    c0 = jnp.zeros((32, 1, 512, 8, 128), jnp.bfloat16)
    u0 = jnp.ones((1, 1, 512, 8, 128), jnp.bfloat16)

    def mk(n):
        @jax.jit
        def run():
            def body(carry, _):
                c, j = carry
                for i in range(n):
                    c = jax.lax.dynamic_update_slice(
                        c, u0 * (j + i).astype(jnp.bfloat16), (j % 32, 0, 0, 0, 0))
                return (c, j + 1), ()
            (c, _), _ = jax.lax.scan(body, (c0, jnp.int32(0)), None, length=R)
            return c[0, 0, 0, 0, :8]
        return run
    print(f"cache DUS [1,512,8,128]:       {chain_cost(mk)*1e6:7.2f} us/op")


def _tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def probe_pallas_dispatch():
    """Chain of minimal pallas_calls on [8, 128] f32."""
    x0 = jnp.ones((8, 128), jnp.float32)
    call = lambda x: pl.pallas_call(
        _tiny_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(x)

    def mk(n):
        @jax.jit
        def run():
            def body(x, _):
                for _ in range(n):
                    x = call(x)
                return x, ()
            x, _ = jax.lax.scan(body, x0, None, length=R)
            return x[0, :8]
        return run
    print(f"pallas dispatch (tiny):        {chain_cost(mk)*1e6:7.2f} us/call")


def probe_quantize_planes():
    """The actual a8s pre-matmul activation chain (quantize+planes), K=4096."""
    from blama_tpu.ops.pallas.quant_matmul import _a8s_planes, _quant_acts
    x0 = jnp.ones((1, 4096), jnp.float32)

    def mk(n):
        @jax.jit
        def run():
            def body(x, _):
                for i in range(n):
                    xq, xs, xsum = _quant_acts(x + jnp.float32(i * 1e-9))
                    p_lo, p_hi = _a8s_planes(xq, 4)
                    x = x + p_lo[0, :1].astype(jnp.float32) * 1e-30 \
                        + xs[0, :1] * 1e-30 + p_hi[0, :1].astype(jnp.float32) * 1e-30
                return x, ()
            x, _ = jax.lax.scan(body, x0, None, length=R)
            return x[0, :8]
        return run
    print(f"quantize+planes chain K=4096:  {chain_cost(mk)*1e6:7.2f} us/op")


def probe_rope():
    from blama_tpu.ops.rope import apply_rope, rope_angles
    q0 = jnp.ones((1, 1, 32, 128), jnp.bfloat16)
    pos = jnp.ones((1, 1), jnp.int32)
    cs = rope_angles(pos, 128, 500000.0)

    def mk(n):
        @jax.jit
        def run():
            def body(q, _):
                for i in range(n):
                    q = apply_rope(q, pos, 128, 500000.0, True, cos_sin=cs)
                    q = q + jnp.bfloat16(i * 1e-9)
                return q, ()
            q, _ = jax.lax.scan(body, q0, None, length=R)
            return q[0, 0, 0, :8]
        return run
    print(f"apply_rope q [1,1,32,128]:     {chain_cost(mk)*1e6:7.2f} us/op")


if __name__ == "__main__":
    probe_xla_elementwise()
    probe_xla_reduce()
    probe_dus()
    probe_quantize_planes()
    probe_rope()
    probe_pallas_dispatch()
