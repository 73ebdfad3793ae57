"""Fused ICI collective kernels (Pallas remote DMA).

The k-sharded quantized matmuls reduce their partial products across the tp
axis. The production path software-pipelines that reduce at XLA-op
granularity (column-chunked psum, ops/pallas/quant_matmul._qmm_sharded) so
the compiler overlaps ICI transfers with the next chunk's kernel. This
module is the IN-KERNEL version the north star asks for ("ICI collectives
overlapped with compute"): one Pallas kernel per device launches the
partial's transfer to every peer as CONCURRENT remote DMAs
(pltpu.make_async_remote_copy) and accumulates arrivals in a FIXED global
device order, so

  * all transfers fly simultaneously over ICI (a ring psum serializes
    tp - 1 hops; for the [1, N] decode partials that are latency-bound,
    concurrent direct sends are the lower-latency shape), and
  * every device sums partial_0 + partial_1 + ... + partial_{tp-1} in the
    SAME order, so the result is bit-identical on every device and across
    runs — the determinism the verification contract needs (psum's internal
    order is backend-defined; this kernel's is pinned by construction).

Single-chip environments can't measure ICI, so correctness is pinned on the
multi-device CPU mesh via the Pallas TPU interpret mode (which simulates
inter-device DMA); tools/ubench_collective.py carries the on-hardware A/B
for when a multi-chip slice is available.

Reference anchor: the reference has no distributed execution at all
(SURVEY.md §5.8); this implements the north-star replacement for the
engine's NCCL-style allreduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _all_reduce_kernel(x_ref, out_ref, gather_ref, send_sem, recv_sem,
                       *, axis: str, tp: int):
    """Per-device body: publish the local partial into every peer's gather
    slot (concurrent RDMAs), then accumulate slots in device order."""
    my = jax.lax.axis_index(axis)

    # own partial into the local gather slot (plain VMEM copy)
    gather_ref[my] = x_ref[:]

    # one concurrent RDMA per peer: my partial -> peer's gather slot `my`.
    # SPMD symmetry: at program point `off`, device (my - off) targets ME
    # with the same semaphore indices, so descriptor.wait() — which waits
    # the local send_sem AND the local recv_sem — observes exactly my
    # outbound copy retiring and the matching inbound copy landing.
    rdmas = []
    for off in range(1, tp):
        peer = jax.lax.rem(my + off, tp)
        rdma = pltpu.make_async_remote_copy(
            src_ref=gather_ref.at[my],
            dst_ref=gather_ref.at[my],
            send_sem=send_sem.at[off - 1],
            recv_sem=recv_sem.at[off - 1],
            device_id=peer,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdmas.append(rdma)
    for rdma in rdmas:
        rdma.wait()

    # fixed-order accumulation: device 0 first, always
    acc = gather_ref[0].astype(jnp.float32)
    for d in range(1, tp):
        acc = acc + gather_ref[d].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("axis", "tp", "interpret"))
def fused_all_reduce(x: jnp.ndarray, axis: str, tp: int,
                     interpret: bool = False) -> jnp.ndarray:
    """All-reduce `x` (a per-device partial, same shape everywhere) over the
    shard_map axis `axis` inside ONE Pallas kernel. Call from within
    jax.shard_map. Returns the sum with a pinned device-order accumulation
    (bit-identical on every device)."""
    assert x.ndim == 2, x.shape
    kernel = functools.partial(_all_reduce_kernel, axis=axis, tp=tp)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tp,) + x.shape, x.dtype),   # gather slots
            pltpu.SemaphoreType.DMA((tp - 1,)),      # send
            pltpu.SemaphoreType.DMA((tp - 1,)),      # recv
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=0,
            has_side_effects=True,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x)


def shard_map_all_reduce(mesh, x: jnp.ndarray, axis: str = "tp"):
    """Convenience wrapper: all-reduce a replicated-output partial over
    `axis` using the fused kernel (x sharded over nothing; each device's
    VALUE differs — shard_map with replicated specs carries it)."""
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape[axis]
    interp = jax.default_backend() == "cpu"

    def body(xl):
        return fused_all_reduce(xl, axis, tp, interpret=interp)

    return jax.shard_map(
        body, mesh=mesh, in_specs=P(axis, None), out_specs=P(None, None),
        check_vma=False,
    )(x)
