"""A/B the k-sharded qmm reduce: chunked-psum vs the fused in-kernel
remote-DMA all-reduce (ops/pallas/collectives) — VERDICT r4 #6.

Needs >= 2 devices on a real ICI mesh to measure anything (this
environment exposes one chip; on CPU the kernel runs in interpret mode and
only correctness is meaningful — use tests/test_collectives.py for that).

Usage: python -m blama_tpu.tools.ubench_collective [K] [N] [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 14336
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    devs = jax.devices()
    if len(devs) < 2:
        print(f"# only {len(devs)} device(s); fused-vs-psum A/B needs an "
              "ICI mesh — run tests/test_collectives.py for correctness")
        return
    tp = len(devs)
    mesh = Mesh(np.array(devs).reshape(tp), ("tp",))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((tp, N)).astype(np.float32))

    from blama_tpu.ops.pallas.collectives import fused_all_reduce

    def run_psum(xl):
        return jax.lax.psum(xl, "tp")

    def run_fused(xl):
        return fused_all_reduce(xl, "tp", tp,
                                interpret=jax.default_backend() == "cpu")

    for name, fn in (("psum", run_psum), ("fused", run_fused)):
        f = jax.jit(jax.shard_map(
            lambda xl, fn=fn: fn(xl), mesh=mesh,
            in_specs=P("tp", None), out_specs=P(None, None),
            check_vma=False))
        np.asarray(f(x))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:6s} [{tp}x1,{N}] f32  {dt*1e6:8.1f} us/allreduce")


if __name__ == "__main__":
    main()
