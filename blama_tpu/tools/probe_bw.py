"""Probe HBM streaming bandwidth through Pallas BlockSpecs of various shapes.

Isolates the memory pipeline from compute: kernel reads the block and adds a
row-sum into the output. If streaming alone is slow, the kernel geometry (not
VPU/MXU work) is the decode-kernel bottleneck.
"""
import os
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stream_kernel(c_ref, o_ref):
    k = pl.program_id(1)
    # touch every byte with minimal VPU work: sum 32-row slabs via matmul-free
    # reduction (sum over sublanes is cheap)
    # the BlockSpec DMA streams the whole block into VMEM; touching one row
    # keeps VPU work negligible so this measures the memory pipeline alone
    s = c_ref[0:8, :].astype(jnp.int32).sum(axis=0, keepdims=True).astype(jnp.float32)

    @pl.when(k == 0)
    def _():
        o_ref[:] = s

    @pl.when(k != 0)
    def _():
        o_ref[:] = o_ref[:] + s


@partial(jax.jit, static_argnums=(1, 2))
def stream(codes, bk, bn):
    R, N = codes.shape
    grid = (N // bn, R // bk)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bk, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(codes)


def main():
    rng = np.random.default_rng(0)
    R, N = 2048, 14336  # q4k codes shape for K=4096
    L = 16
    codes = jnp.asarray(rng.integers(0, 255, (L, R, N), dtype=np.uint8))

    @partial(jax.jit, static_argnums=(1, 2))
    def run(all_codes, bk, bn):
        def body(acc, c):
            return acc + stream(c, bk, bn)[0, 0], ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), all_codes)
        return acc

    for bk, bn in [(1024, 4096), (1024, 2048), (512, 7168), (2048, 2048),
                   (2048, 7168), (512, 14336), (256, 14336), (1024, 14336)]:
        try:
            r = run(codes, bk, bn)
            np.asarray(r)
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps // L + 1):
                r = run(codes, bk, bn)
            np.asarray(r)
            dt = (time.perf_counter() - t0) / ((reps // L + 1) * L)
            gbs = R * N / dt / 1e9
            print(f"block ({bk:5d},{bn:6d}): {dt*1e3:7.3f} ms  {gbs:7.1f} GB/s")
        except Exception as e:
            print(f"block ({bk:5d},{bn:6d}): FAIL {str(e)[:90]}")


if __name__ == "__main__":
    main()


def xla_baseline():
    rng = np.random.default_rng(0)
    L, R, N = 16, 2048, 14336
    codes = jnp.asarray(rng.integers(0, 255, (L, R, N), dtype=np.uint8))
    f = jax.jit(lambda c: jnp.sum(c, dtype=jnp.int32))
    r = f(codes); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(codes)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / 3
    print(f"XLA full-sum 470MB: {dt*1e3:.2f} ms  {L*R*N/dt/1e9:.0f} GB/s")

    # single pallas call over one layer, timed without scan
    c0 = codes[0]
    s = jax.jit(lambda c: stream(c, 256, 14336))
    r = s(c0); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = s(c0)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / 10
    print(f"pallas stream 29MB solo: {dt*1e3:.2f} ms  {R*N/dt/1e9:.0f} GB/s")
