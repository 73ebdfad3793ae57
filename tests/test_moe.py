"""MoE (Mixtral-family) tests: config detection, generation, verification
replay, and expert-sharded execution (BASELINE.json config #4 analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_moe


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("moe") / "moe.gguf")
    write_tiny_moe(p)
    m = Model(p)
    yield m
    m.close()


def test_moe_config_detected(model):
    assert model.config.is_moe
    assert model.config.n_expert == 4
    assert model.config.n_expert_used == 2


def test_moe_generation_deterministic(model):
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    outs = []
    for _ in range(2):
        s = inst.start_session(SessionInitParams(seed=9, temperature=0.0))
        s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
        outs.append([p.token for p in s.complete(CompleteParams(max_tokens=6))])
        inst.stop_session()
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_moe_fillctx_bitexact(model):
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=9, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize("the cat", True, True))
    preds = s.complete(CompleteParams(max_tokens=5))
    inst.stop_session()

    s2 = inst.start_session(SessionInitParams(seed=9, temperature=0.0))
    s2.set_initial_prompt(model.vocab.tokenize("the cat", True, True))
    replayed = s2.fill_ctx(preds)
    inst.stop_session()
    for o, r in zip(preds, replayed):
        assert {td.token: td.logit for td in o.logits} == {td.token: td.logit for td in r.logits}


def test_moe_expert_sharded(model):
    """Expert-parallel execution over the tp axis matches single-device."""
    from blama_tpu.models.moe import MoEStatic, forward, moe_param_specs
    from blama_tpu.ops.kv_cache import KVCache
    from blama_tpu.parallel import sharding as sh
    from blama_tpu.parallel.mesh import make_mesh

    cfg = model.config
    st = MoEStatic.of(cfg)
    B, S, T = 1, 32, 8
    toks = jnp.tile(jnp.arange(3, 3 + T, dtype=jnp.int32), (B, 1))
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    li = jnp.full((B,), T - 1, jnp.int32)

    def run(mesh):
        specs = sh.specs_for_tree(model.weights, moe_param_specs())
        params = sh.shard_params(model.weights, mesh, specs)
        cache = KVCache.create(cfg.n_layer, B, S, cfg.n_head_kv, cfg.head_dim_, jnp.float32)
        step = jax.jit(lambda p, t, po, s, c, l: forward(p, st, t, po, s, c, l))
        logits, _ = step(params, toks, pos, pos, cache, li)
        return np.asarray(logits)

    l1 = run(make_mesh(1, 1))
    l4 = run(make_mesh(1, 4))
    np.testing.assert_allclose(l1, l4, rtol=2e-4, atol=2e-4)


def test_moe_ragged_matches_dense_mixture(tmp_path):
    """The ragged grouped-matmul mixture (lax.ragged_dot over expert-sorted
    token copies) routes identically to the dense masked mixture: same
    greedy tokens, logits within bf16 tolerance."""
    from blama_tpu.runtime.model import ModelParams

    p = str(tmp_path / "moe.gguf")
    write_tiny_moe(p)

    def run(ragged):
        m = Model(p, ModelParams(moe_ragged=ragged))
        assert m.config.moe_ragged is ragged
        inst = Instance(m, InstanceInitParams(ctx_size=64))
        s = inst.start_session(SessionInitParams(seed=9, temperature=0.0))
        s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
        preds = s.complete(CompleteParams(max_tokens=6))
        inst.stop_session()
        m.close()
        return preds

    dense = run(False)
    ragged = run(True)
    assert [p.token for p in dense] == [p.token for p in ragged]
    for a, b in zip(dense, ragged):
        la = {td.token: td.logit for td in a.logits}
        lb = {td.token: td.logit for td in b.logits}
        assert set(la) == set(lb)
        for t in la:
            assert abs(la[t] - lb[t]) < 0.05


def test_moe_fast_greedy_matches_slow(model):
    """The device-loop fast path (generate_loop dispatching to moe.forward)
    produces the same tokens and top-10 logits as the step-by-step path."""
    from blama_tpu.runtime.instance import InstanceInitParams as IIP

    def run(fast):
        inst = Instance(model, IIP(ctx_size=64, fast_greedy=fast))
        s = inst.start_session(SessionInitParams(seed=9, temperature=0.0))
        s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
        preds = s.complete(CompleteParams(max_tokens=6))
        inst.stop_session()
        return preds

    slow, fast = run(False), run(True)
    assert [p.token for p in slow] == [p.token for p in fast]
    for a, b in zip(slow, fast):
        la = {td.token: td.logit for td in a.logits}
        lb = {td.token: td.logit for td in b.logits}
        assert set(la) == set(lb)


def test_synthesize_moe_gguf_loads_and_generates(tmp_path):
    """The scaled-Mixtral bench synthesizer (debug geometry) writes a loadable
    GGUF whose Q4_K expert banks run through the fused greedy loop."""
    import jax.numpy as jnp

    from blama_tpu.models.moe import MoEStatic
    from blama_tpu.ops.generate_loop import greedy_generate
    from blama_tpu.ops.kv_cache import KVCache
    from blama_tpu.runtime.model import ModelParams
    from blama_tpu.testing import synthesize_moe_gguf

    p = str(tmp_path / "mx.gguf")
    spec = synthesize_moe_gguf(p, "mixtral-debug")
    m = Model(p, ModelParams(dtype="float32", moe_ragged=True))
    assert m.config.is_moe and m.config.n_expert == spec["n_expert"]
    cfg = m.config
    st = MoEStatic.of(cfg)
    assert st.ragged
    cache = KVCache.create(cfg.n_layer, 1, 64, cfg.n_head_kv, cfg.head_dim_,
                           jnp.float32)
    prompt = jnp.asarray(np.arange(5, 13, dtype=np.int32)[None])
    toks, tid, tval, _ = greedy_generate(st, m.weights, prompt, cache, 8, 8)
    assert np.asarray(toks).shape == (1, 8)
    assert np.isfinite(np.asarray(tval)).all()
    m.close()


# -- quantized expert banks (QuantExperts) ------------------------------------

@pytest.fixture(scope="module")
def quant_gguf(tmp_path_factory):
    from blama_tpu.testing import synthesize_moe_gguf

    p = str(tmp_path_factory.mktemp("moeq") / "mq.gguf")
    synthesize_moe_gguf(p, "mixtral-debug")
    return p


@pytest.mark.parametrize("dt", ["q4k_fused", "q4k_a8"])
def test_moe_quant_generate_and_replay_bitexact(quant_gguf, dt):
    """4-bit-packed expert banks serve end-to-end, and a fast-loop prover's
    claim replays bit-exactly through fill_ctx (the teacher-forced device
    loop executes the prover's own program shape)."""
    from blama_tpu.models.moe import QuantExperts
    from blama_tpu.runtime.model import ModelParams

    m = Model(quant_gguf, ModelParams(dtype=dt))
    try:
        assert isinstance(m.weights["layers"][0]["w_gate_exps"], QuantExperts)
        inst = Instance(m, InstanceInitParams(ctx_size=64))
        s = inst.start_session(SessionInitParams(seed=3, temperature=0.0))
        s.set_initial_prompt(m.vocab.tokenize("hello quant experts", True, True))
        preds = s.complete(CompleteParams(max_tokens=6))
        inst.stop_session()

        inst2 = Instance(m, InstanceInitParams(ctx_size=64))
        s2 = inst2.start_session(SessionInitParams(seed=3, temperature=0.0))
        s2.set_initial_prompt(m.vocab.tokenize("hello quant experts", True, True))
        rep = s2.fill_ctx(preds)
        inst2.stop_session()
        for a, b in zip(preds, rep):
            assert {t.token: t.logit for t in a.logits} == \
                   {t.token: t.logit for t in b.logits}
    finally:
        m.close()


def test_moe_quant_exact_engine_matches_dense_reference(quant_gguf):
    """q4k_fused dequant values are exact, so greedy tokens agree with the
    host-dequant dense f32 reference on this fixture."""
    from blama_tpu.runtime.model import ModelParams

    def toks_for(params):
        m = Model(quant_gguf, params)
        try:
            inst = Instance(m, InstanceInitParams(ctx_size=64))
            s = inst.start_session(SessionInitParams(seed=3, temperature=0.0))
            s.set_initial_prompt(m.vocab.tokenize("hello quant experts", True, True))
            out = [p.token for p in s.complete(CompleteParams(max_tokens=6))]
            inst.stop_session()
            return out
        finally:
            m.close()

    assert toks_for(ModelParams(dtype="q4k_fused")) == \
        toks_for(ModelParams(dtype="float32", moe_ragged=False))


def test_moe_quant_routed_matches_padded_masked(quant_gguf):
    """A T=1 decode (routed gather path) and the same token inside a padded
    T=8 step (masked all-expert path) produce identical logits — ascending
    expert-order accumulation + exact 0-weight no-ops (session decode
    bucketing must not change verification numerics)."""
    from blama_tpu.models.moe import MoEStatic, forward
    from blama_tpu.ops.kv_cache import KVCache
    from blama_tpu.runtime.model import ModelParams

    m = Model(quant_gguf, ModelParams(dtype="q4k_fused"))
    try:
        cfg = m.config
        st = MoEStatic.of(cfg)

        def run(T):
            cache = KVCache.create(cfg.n_layer, 1, 64, cfg.n_head_kv,
                                   cfg.head_dim_, jnp.bfloat16)
            toks = np.zeros((1, T), np.int32)
            toks[0, 0] = 7
            pos = np.zeros((1, T), np.int32)
            sl = np.full((1, T), 64, np.int32)
            sl[0, 0] = 0
            lg, _ = jax.jit(
                lambda p, t, q, s, c: forward(p, st, t, q, s, c,
                                              jnp.zeros((1,), jnp.int32))
            )(m.weights, jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(sl),
              cache)
            return np.asarray(lg)

        np.testing.assert_array_equal(run(1), run(8))
    finally:
        m.close()


@pytest.mark.parametrize("a8", [False, True])
def test_moe_bank_repack_vectorized_matches_loop(quant_gguf, a8):
    """The all-experts-at-once bank repack (_repack_bank: one native repack
    over the concatenated (Ne*N, K) matrix + device split) is bit-identical
    to the per-expert loop it replaces."""
    from blama_tpu.gguf.constants import GGMLType
    from blama_tpu.gguf.reader import GGUFReader
    from blama_tpu.models.moe import _repack_bank
    from blama_tpu.ops.pallas.quant_matmul import (repack_q4k_a8s,
                                                   repack_q4k_for_tpu)

    repack = repack_q4k_a8s if a8 else repack_q4k_for_tpu
    r = GGUFReader(quant_gguf)
    try:
        name = "blk.0.ffn_gate_exps.weight"
        info = r.tensors[name]
        assert info.ggml_type == GGMLType.Q4_K
        K, N, Ne = info.ne
        raw = np.frombuffer(r.tensor_bytes(name), np.uint8).copy()
        bank = _repack_bank(raw, K, N, Ne, a8)
        assert bank is not None, "fast path should engage on this geometry"
        assert bank.a8 == a8 and bank.n_out == N
        per = N * (K // 256) * 144
        for e in range(Ne):
            p = repack(raw[e * per:(e + 1) * per], N, K)
            np.testing.assert_array_equal(np.asarray(bank.codes[e]),
                                          np.asarray(p.codes))
            np.testing.assert_array_equal(
                np.asarray(bank.scales[e]).view(np.uint16)
                if a8 else np.asarray(bank.scales[e]),
                np.asarray(p.scales).view(np.uint16)
                if a8 else np.asarray(p.scales))
            np.testing.assert_array_equal(
                np.asarray(bank.mins[e]).view(np.uint16)
                if a8 else np.asarray(bank.mins[e]),
                np.asarray(p.mins).view(np.uint16)
                if a8 else np.asarray(p.mins))
    finally:
        r.close()


@pytest.mark.parametrize("a8", [False, True])
def test_bank_matmul_indirection_matches_gather(quant_gguf, a8):
    """The scalar-prefetch expert-indirect bank kernel (bank_matmul, VERDICT
    r2 #4) reads the routed experts' packed bytes IN PLACE; its per-expert
    products must match the gather-then-qmm path it replaced (exactly up to
    the min-correction association, which moved in-kernel)."""
    from blama_tpu.models.moe import _load_moe_fused  # noqa: F401 (path import)
    from blama_tpu.gguf.reader import GGUFReader
    from blama_tpu.models.moe import _repack_bank
    from blama_tpu.ops.pallas.quant_matmul import bank_matmul, qmm

    r = GGUFReader(quant_gguf)
    try:
        name = "blk.0.ffn_gate_exps.weight"
        info = r.tensors[name]
        K, N, Ne = info.ne
        raw = np.frombuffer(r.tensor_bytes(name), np.uint8).copy()
        bank = _repack_bank(raw, K, N, Ne, a8)
        assert bank is not None
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
        eids = jnp.asarray([Ne - 1, 1], jnp.int32)  # unsorted, non-trivial
        out = np.asarray(bank_matmul(x, bank.codes, bank.scales, bank.mins,
                                     eids, bank.a8))[..., :bank.n_out]
        for j, e in enumerate([Ne - 1, 1]):
            ref = np.asarray(qmm(x, bank.expert(e)))
            np.testing.assert_allclose(out[j], ref, rtol=2e-4, atol=2e-4)
    finally:
        r.close()


def test_moe_int8_kv_matches_float(tmp_path):
    """MoE INT8 KV (round 4): quantize-on-write / dequant-on-read like the
    llama forward — previously bf16 values were silently VALUE-CAST into an
    int8 cache, corrupting attention. Greedy tokens must track the float-KV
    engine, and replay must be bit-exact within the int8 engine."""
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.testing import write_tiny_moe

    p = str(tmp_path / "m8.gguf")
    write_tiny_moe(p)
    m = Model(p)

    def run(kv):
        inst = Instance(m, InstanceInitParams(ctx_size=64, kv_dtype=kv,
                                              fast_greedy=False))
        s = inst.start_session(SessionInitParams(seed=3, temperature=0.0))
        s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
        preds = s.complete(CompleteParams(max_tokens=6))
        inst.stop_session()
        return preds

    f32 = run("float32")
    i8 = run("int8")
    # int8 KV is its own numerics; token agreement on the tiny fixture
    assert [x.token for x in i8] == [x.token for x in f32]

    inst = Instance(m, InstanceInitParams(ctx_size=64, kv_dtype="int8",
                                          fast_greedy=False))
    s2 = inst.start_session(SessionInitParams(seed=3, temperature=0.0))
    s2.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
    rep = s2.fill_ctx(i8)
    inst.stop_session()
    m.close()
    for o, r in zip(i8, rep):
        assert [l.logit for l in o.logits] == [l.logit for l in r.logits]
