"""Sharding tests on the virtual 8-device CPU mesh: mesh construction, the
multi-chip dry run, and cross-sharding logit agreement (the single-chip
prover vs sharded verifier scenario from SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from blama_tpu.models.llama import LlamaStatic, forward
from blama_tpu.ops.kv_cache import KVCache
from blama_tpu.parallel import sharding as sh
from blama_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from blama_tpu.gguf import GGMLType
    from blama_tpu.runtime.model import Model
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path_factory.mktemp("p") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0, spec={"n_head": 8, "n_head_kv": 4})
    m = Model(p)
    yield m
    m.close()


def test_mesh_shapes():
    assert make_mesh(1, 8).shape == {"dp": 1, "tp": 8}
    assert make_mesh(2, 4).shape == {"dp": 2, "tp": 4}
    assert make_mesh(2).shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(3)
    with pytest.raises(ValueError):
        make_mesh(4, 4)


def _run_step(model, mesh, tp_blocks=0, specs=None, kv=None):
    cfg = model.config
    st = LlamaStatic.of(cfg)
    if tp_blocks:
        import dataclasses
        st = dataclasses.replace(st, tp_blocks=tp_blocks)
    B, S, T = mesh.shape["dp"], 32, 8
    specs = sh.specs_for_tree(model.weights, specs or sh.llama_param_specs())
    params = sh.shard_params(model.weights, mesh, specs)
    kv = kv or sh.kv_cache_specs()
    cache = KVCache.create(cfg.n_layer, B, S, cfg.n_head_kv, cfg.head_dim_, jnp.float32)
    cache = KVCache(
        jax.device_put(cache.k, NamedSharding(mesh, kv["k"])),
        jax.device_put(cache.v, NamedSharding(mesh, kv["v"])),
        jax.device_put(cache.positions, NamedSharding(mesh, kv["positions"])),
    )
    toks = jnp.tile(jnp.arange(3, 3 + T, dtype=jnp.int32), (B, 1))
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    li = jnp.full((B,), T - 1, jnp.int32)
    step = jax.jit(lambda p, t, po, s, c, l: forward(p, st, t, po, s, c, l))
    logits, cache = step(params, toks, pos, pos, cache, li)
    return np.asarray(logits)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_cross_sharding_logit_agreement(model):
    """tp=1 vs tp=4: logits must agree closely (threshold analog of the
    reference's cross-backend CUDA↔CPU replay, t-LogitComparer.cpp:41-79;
    bit-exactness across shardings is tracked as the north-star goal)."""
    l1 = _run_step(model, make_mesh(1, 1))
    l4 = _run_step(model, make_mesh(1, 4))
    l8 = _run_step(model, make_mesh(2, 4))
    np.testing.assert_allclose(l1, l4, rtol=2e-4, atol=2e-4)
    # dp replicates the same sequence per batch row
    np.testing.assert_allclose(l1[0], l8[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(l8[0], l8[1], rtol=2e-4, atol=2e-4)
    # top-10 token sets agree exactly
    t1 = set(np.argsort(-l1[0])[:10].tolist())
    t4 = set(np.argsort(-l4[0])[:10].tolist())
    assert t1 == t4


def test_cross_sharding_bit_exact_with_tp_blocks(model):
    """With tp_blocks=8, every matmul's per-device gemm leaf shape is pinned
    (fixed-width column blocks for output-sharded projections, a fixed
    K-block add tree for contraction-sharded ones), so the FULLY tp-sharded
    model produces BIT-IDENTICAL logits at tp 1/2/4 and under dp — the
    north-star cross-sharding verification guarantee (any-host-count replay,
    SURVEY.md §7.3 hardest-part #1)."""
    # tp is bounded by the fixture's 4 kv heads (KV shards on the head axis)
    l1 = _run_step(model, make_mesh(1, 1), tp_blocks=8)
    l2 = _run_step(model, make_mesh(1, 2), tp_blocks=8)
    l4 = _run_step(model, make_mesh(1, 4), tp_blocks=8)
    ldp = _run_step(model, make_mesh(2, 4), tp_blocks=8)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(l1, l4)
    np.testing.assert_array_equal(l1[0], ldp[0])
    np.testing.assert_array_equal(ldp[0], ldp[1])


def test_sharded_session_matches_unsharded(model):
    """A full Session on a (1, 4) tp mesh generates the same greedy tokens
    as single-device (the real sharded serving path, not just the dryrun)."""
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.testing import write_tiny_llama
    import tempfile

    p = tempfile.mktemp(suffix=".gguf")
    from blama_tpu.gguf import GGMLType

    write_tiny_llama(p, GGMLType.Q8_0, spec={"n_head": 8, "n_head_kv": 4})

    def run(mesh):
        m = Model(p, ModelParams(mesh=mesh))
        inst = Instance(m, InstanceInitParams(ctx_size=64))
        s = inst.start_session(SessionInitParams(seed=4, temperature=0.0))
        s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
        out = [pr.token for pr in s.complete(CompleteParams(max_tokens=6))]
        inst.stop_session()
        m.close()
        return out

    single = run(None)
    sharded = run(make_mesh(1, 4))
    assert single == sharded


@pytest.mark.parametrize("dtype", ["q4k_fused", "q4k_a8"])
def test_sharded_quantized_session_matches_solo(dtype, tmp_path):
    """Mesh-sharded QUANTIZED serving (ShardedQuant shard_map islands around
    the Pallas kernels): tp=2 greedy generation matches single-device.
    K-sharded projections (wo/w_down) need K % (tp*256) == 0, hence the
    512-wide spec."""
    from blama_tpu.gguf import GGMLType
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path / "shq.gguf")
    write_tiny_llama(p, GGMLType.Q4_K,
                     spec=dict(n_embd=512, n_ff=1024, n_head=4, n_head_kv=2))

    def run(mesh):
        m = Model(p, ModelParams(dtype=dtype, mesh=mesh, tp_blocks=0))
        if mesh is not None:
            from blama_tpu.ops.pallas.quant_matmul import ShardedQuant
            l0 = m.weights["layers"][0]
            assert isinstance(l0["wq"], ShardedQuant) and l0["wq"].axis == "n"
            assert isinstance(l0["wo"], ShardedQuant) and l0["wo"].axis == "k"
        inst = Instance(m, InstanceInitParams(ctx_size=64))
        s = inst.start_session(SessionInitParams(seed=1, temperature=0.0))
        s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
        out = [pr.token for pr in s.complete(CompleteParams(max_tokens=6))]
        inst.stop_session()
        m.close()
        return out

    assert run(None) == run(make_mesh(1, 2))
