"""Fused ICI collective kernel (ops/pallas/collectives) — VERDICT r4 #6.

Single-chip environments can't measure ICI, so these pin semantics on the
multi-device CPU mesh through the Pallas TPU interpret mode (which simulates
the inter-device DMAs): fixed-order bit-exactness, psum agreement, and the
k-sharded quantized matmul served end-to-end through the fused path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from blama_tpu.ops.pallas.collectives import (fused_all_reduce,
                                              shard_map_all_reduce)


def _mesh(tp):
    if len(jax.devices()) < tp:
        pytest.skip(f"needs {tp} devices")
    return Mesh(np.array(jax.devices()[:tp]).reshape(tp), ("tp",))


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_fused_all_reduce_fixed_order_bits(tp):
    """Every device's result equals the FIXED device-order sum bit-for-bit
    (psum's internal order is backend-defined; this kernel pins it)."""
    mesh = _mesh(tp)
    rng = np.random.default_rng(tp)
    x = jnp.asarray(rng.standard_normal((tp * 3, 512)).astype(np.float32))
    out = shard_map_all_reduce(mesh, x)
    parts = x.reshape(tp, 3, 512)
    acc = parts[0]
    for d in range(1, tp):
        acc = acc + parts[d]
    assert jnp.array_equal(out, acc)
    assert jnp.allclose(out, parts.sum(0), rtol=1e-6)


def test_fused_all_reduce_every_device_identical():
    """The replicated output holds the same bits on every device (the
    fixed accumulation order is device-independent)."""
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4 * 2, 256)).astype(np.float32))

    def body(xl):
        return fused_all_reduce(xl, "tp", 4,
                                interpret=jax.default_backend() == "cpu")

    # out_specs P("tp", None): keep each device's copy so we can compare
    per_dev = jax.shard_map(
        body, mesh=mesh, in_specs=P("tp", None), out_specs=P("tp", None),
        check_vma=False,
    )(x)
    per_dev = np.asarray(per_dev).reshape(4, 2, 256)
    for d in range(1, 4):
        assert np.array_equal(per_dev[0], per_dev[d])


def test_k_sharded_qmm_through_fused_collective(tmp_path, monkeypatch):
    """The k-sharded quantized matmul reduce served by the fused kernel:
    same greedy stream as the chunked-psum production path (token-level:
    the reduce order differs, like any engine-mode switch)."""
    from blama_tpu.gguf import GGMLType
    from blama_tpu.ops.pallas import quant_matmul as qm
    from blama_tpu.parallel.mesh import make_mesh
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.testing import write_tiny_llama

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    p = str(tmp_path / "fc.gguf")
    write_tiny_llama(p, GGMLType.Q4_K,
                     spec=dict(n_layer=2, n_embd=1024, n_ff=2048,
                               n_head=8, n_head_kv=4))

    from blama_tpu.ops.pallas import collectives as co

    calls = []
    real = co.fused_all_reduce
    monkeypatch.setattr(co, "fused_all_reduce",
                        lambda *a, **k: (calls.append(1), real(*a, **k))[1])

    def run(fused):
        # tp_blocks=0: the k-sharded reduce takes the psum/fused-collective
        # path (tp_blocks engines use the fixed-topology tree instead)
        monkeypatch.setattr(qm, "_FUSED_COLLECTIVE", fused)
        m = Model(p, ModelParams(dtype="q4k_a8", mesh=make_mesh(1, 2),
                                 tp_blocks=0))
        inst = Instance(m, InstanceInitParams(ctx_size=64, kv_dtype="int8",
                                              fast_greedy=False))
        s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
        s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
        preds = s.complete(CompleteParams(max_tokens=6))
        inst.stop_session()
        m.close()
        return [x.token for x in preds]

    fused_toks = run(True)
    assert calls, "fused collective never dispatched"
    assert fused_toks == run(False)
