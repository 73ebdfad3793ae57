"""Fused flash-decode attention kernel (ops/pallas/decode_attention.py).

Op-level: kernel output matches the XLA attention chain (ops/attention.py)
in float32, int8-KV, partial-rope, and bf16 modes. Session-level: the
flash_attn instance flag (reference Instance.hpp:24) produces the same greedy
stream as the XLA engine and replays bit-exactly against itself — the
verification contract for an engine mode (SURVEY.md §3.3).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from blama_tpu.gguf import GGMLType
from blama_tpu.ops.attention import attention
from blama_tpu.ops.kv_cache import dequantize_kv, quantize_kv
from blama_tpu.ops.pallas.decode_attention import (
    decode_attention, effective_inv_freq, supports,
)
from blama_tpu.ops.rope import apply_rope, rope_angles
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model, ModelParams
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_llama


def _setup(B=2, H=8, Hkv=2, D=64, S=128, rope_dim=None, fb=10000.0, seed=0):
    rope_dim = D if rope_dim is None else rope_dim
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kv_pos = np.full((B, S), -1, np.int32)
    lens = [min(S - 5, 50), min(S - 1, 77)][:B]
    for b, ln in enumerate(lens):
        kv_pos[b, :ln] = np.arange(ln)
    kv_pos = jnp.asarray(kv_pos)
    q_pos = jnp.asarray([ln - 1 for ln in lens], jnp.int32)
    qr = apply_rope(q, q_pos[:, None], rope_dim, fb, True,
                    cos_sin=rope_angles(q_pos[:, None], rope_dim, fb))
    return qr, k, v, q_pos, kv_pos, rope_dim, fb


def test_matches_xla_float32():
    qr, k, v, q_pos, kv_pos, rd, fb = _setup()
    ref = attention(qr, k, v, q_pos[:, None], kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = decode_attention(qr, k, v, q_pos, kv_pos, invf, mscale=ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_matches_xla_int8_kv():
    qr, k, v, q_pos, kv_pos, rd, fb = _setup(seed=1)
    kc, ks = quantize_kv(k)
    vc, vs = quantize_kv(v)
    ref = attention(qr, dequantize_kv(kc, ks), dequantize_kv(vc, vs),
                    q_pos[:, None], kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = decode_attention(qr, kc, vc, q_pos, kv_pos, invf,
                           k_scale=ks, v_scale=vs, mscale=ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_matches_xla_partial_rope_dim():
    qr, k, v, q_pos, kv_pos, rd, fb = _setup(rope_dim=32, seed=2)
    ref = attention(qr, k, v, q_pos[:, None], kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = decode_attention(qr, k, v, q_pos, kv_pos, invf, mscale=ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_matches_xla_bf16():
    qr, k, v, q_pos, kv_pos, rd, fb = _setup(seed=3)
    qb, kb, vb = (a.astype(jnp.bfloat16) for a in (qr, k, v))
    ref = attention(qb, kb, vb, q_pos[:, None], kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = decode_attention(qb, kb, vb, q_pos, kv_pos, invf, mscale=ms)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


def test_yarn_effective_inv_freq_matches_rope_angles():
    # eff_inv_freq must reproduce rope_angles' theta as a pure product
    rd, fb = 64, 10000.0
    yarn = (1.0, 1.0, 32.0, 1.0, 2048)
    scale = 0.25
    pos = jnp.asarray([3, 100, 999], jnp.int32)
    cos_ref, sin_ref = rope_angles(pos, rd, fb, scale, yarn=yarn)
    invf, ms = effective_inv_freq(rd, rd, fb, scale, yarn=yarn)
    theta = pos.astype(jnp.float32)[:, None] * invf[None, 0:rd:2]
    # algebraically identical; f32 rounding of theta (≈1e-7 relative) is
    # amplified to ~1e-4 on cos/sin at theta ≈ 1000 rad
    np.testing.assert_allclose(
        np.asarray(jnp.cos(theta) * ms), np.asarray(cos_ref), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jnp.sin(theta) * ms), np.asarray(sin_ref), atol=1e-3)


def test_supports_geometry_gate():
    # Mosaic lane rule (hardware lowering, not just interpret): the sequence
    # block must be a multiple of 128 OR the whole [1, B*S] position row
    assert supports(512, 128, jnp.bfloat16)
    assert supports(384, 128, jnp.bfloat16)       # 128-block
    assert supports(64, 64, jnp.int8)             # single 64-block == B*S
    assert supports(32, 64, jnp.float32)          # single 32-block == B*S
    assert not supports(48, 128, jnp.int8)        # 16/8 blocks don't lower
    assert not supports(48, 128, jnp.float32)
    assert not supports(31, 128, jnp.float32)
    assert not supports(40, 64, jnp.float32)
    # batched: the single-block escape hatch needs bs == B*S, so multi-row
    # caches require a 128-multiple block
    assert supports(256, 128, jnp.bfloat16, batch=4)
    assert not supports(64, 64, jnp.int8, batch=4)


def test_matches_xla_edited_position_map():
    """Context-shift (seq_add) and Self-Extend (seq_div) rewrite the position
    map without moving cache rows; ring-buffer slot reuse scrambles slot
    order entirely. The in-kernel rope-from-position-map must match the XLA
    chain on such non-sequential maps (ADVICE r1 #4)."""
    qr, k, v, q_pos, kv_pos, rd, fb = _setup(seed=4)
    kv_pos = np.asarray(kv_pos).copy()
    B, S = kv_pos.shape
    # row 0: simulate seq_rm(5,20) + seq_add(20,50,-15): positions 5..19
    # vacated (-1), 20..49 shifted down by 15
    row = kv_pos[0]
    row[(row >= 5) & (row < 20)] = -1
    row[row >= 20] -= 15
    # row 1: Self-Extend style div on [0,32) then scramble slot order
    row = kv_pos[1]
    sel = (row >= 0) & (row < 32)
    row[sel] = row[sel] // 4
    perm = np.random.default_rng(5).permutation(S)
    kv_pos[1] = row[perm]
    k = k.at[1].set(k[1, perm])
    v = v.at[1].set(v[1, perm])
    kv_pos = jnp.asarray(kv_pos)
    q_pos = jnp.asarray([int(np.max(kv_pos[b])) + 1 for b in range(B)], jnp.int32)
    qr = apply_rope(
        jnp.asarray(np.random.default_rng(6).normal(size=qr.shape), jnp.float32),
        q_pos[:, None], rd, fb, True, cos_sin=rope_angles(q_pos[:, None], rd, fb))
    ref = attention(qr, k, v, q_pos[:, None], kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = decode_attention(qr, k, v, q_pos, kv_pos, invf, mscale=ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_attn_param_validation(tmp_path):
    """attn is a verification mode: typos and unsupported combinations are
    rejected loudly, never silently downgraded (ADVICE r1 #1/#2)."""
    from blama_tpu.parallel.mesh import make_mesh

    p = str(tmp_path / "v.gguf")
    write_tiny_llama(p, GGMLType.F32)
    with pytest.raises(ValueError, match="must be 'xla' or 'fused'"):
        Model(p, ModelParams(dtype="float32", attn="flash"))
    # fused + mesh is supported (per-head shard_map island, round 4) but
    # still rejects geometries the island can't shard: tp must divide the
    # head counts (whole kv-head slices per device)
    with pytest.raises(ValueError, match="needs tp to divide"):
        Model(p, ModelParams(dtype="float32", attn="fused", mesh=make_mesh(tp=8)))
    m = Model(p, ModelParams(dtype="float32", attn="fused", mesh=make_mesh(tp=2)))
    m.close()


# --- session-level engine-mode tests ---------------------------------------

@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fa") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q4_K)
    return p


def _generate(path, flash, kv_dtype="float32", n=12, fast_greedy=True):
    m = Model(path, ModelParams(dtype="float32"))
    inst = Instance(m, InstanceInitParams(
        ctx_size=64, flash_attn=flash, kv_dtype=kv_dtype,
        fast_greedy=fast_greedy))
    s = inst.start_session(SessionInitParams(seed=7, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize("the cat sat", True, True))
    preds = s.complete(CompleteParams(max_tokens=n))
    inst.stop_session()
    m.close()
    return preds


def test_flash_attn_same_greedy_stream(gguf_path):
    base = _generate(gguf_path, flash=False)
    fused = _generate(gguf_path, flash=True)
    assert [p.token for p in base] == [p.token for p in fused]


def test_flash_attn_slow_path_matches_device_loop(gguf_path):
    fast = _generate(gguf_path, flash=True, fast_greedy=True)
    slow = _generate(gguf_path, flash=True, fast_greedy=False)
    assert [p.token for p in fast] == [p.token for p in slow]
    for a, b in zip(fast, slow):
        assert [l.token for l in a.logits] == [l.token for l in b.logits]
        np.testing.assert_array_equal(
            np.asarray([l.logit for l in a.logits], np.float32),
            np.asarray([l.logit for l in b.logits], np.float32))


def test_flash_attn_across_context_shift(gguf_path):
    """Fused decode across a context-shift event (infinite_context) produces
    the same greedy stream as the XLA engine — the kernel reads the edited
    position map, not write order (ADVICE r1 #4, session level)."""
    # short prompt (< 8 tokens) keeps prefill on the shared XLA path, so the
    # streams compare fused DECODE against XLA decode across the shift (the
    # fused-prefill engine mode has its own numerics and its own tests)
    def run(flash):
        m = Model(gguf_path, ModelParams(dtype="float32"))
        inst = Instance(m, InstanceInitParams(
            ctx_size=32, flash_attn=flash, fast_greedy=False))
        s = inst.start_session(SessionInitParams(
            seed=3, temperature=0.0, infinite_context=True))
        s.set_initial_prompt(m.vocab.tokenize("the cat sat", True, True))
        preds = s.complete(CompleteParams(max_tokens=40))  # > ctx 32 → shift
        inst.stop_session()
        m.close()
        return preds

    base, fused = run(False), run(True)
    assert len(base) > 30
    assert [p.token for p in base] == [p.token for p in fused]


def test_flash_attn_replay_bit_exact(gguf_path):
    preds = _generate(gguf_path, flash=True, kv_dtype="int8")
    m = Model(gguf_path, ModelParams(dtype="float32"))
    inst = Instance(m, InstanceInitParams(
        ctx_size=64, flash_attn=True, kv_dtype="int8"))
    s = inst.start_session(SessionInitParams(seed=7, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize("the cat sat", True, True))
    replayed = s.fill_ctx(preds)
    inst.stop_session()
    m.close()
    for o, r in zip(preds, replayed):
        assert [l.token for l in o.logits] == [l.token for l in r.logits]
        np.testing.assert_array_equal(
            np.asarray([l.logit for l in o.logits], np.float32),
            np.asarray([l.logit for l in r.logits], np.float32))


# --- fused prefill (T > 1) ---------------------------------------------------

def _setup_prefill(B=2, T=16, H=8, Hkv=2, D=64, S=128, rope_dim=None,
                   fb=10000.0, seed=10, prior=20):
    """Chunk of T queries arriving after `prior` cached tokens."""
    from blama_tpu.ops.pallas.decode_attention import prefill_attention

    rope_dim = D if rope_dim is None else rope_dim
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kv_pos = np.full((B, S), -1, np.int32)
    kv_pos[:, :prior + T] = np.arange(prior + T)
    q_pos = np.tile(np.arange(prior, prior + T, dtype=np.int32), (B, 1))
    q_pos = jnp.asarray(q_pos, jnp.int32)
    kv_pos = jnp.asarray(kv_pos)
    qr = apply_rope(q, q_pos, rope_dim, fb, True,
                    cos_sin=rope_angles(q_pos, rope_dim, fb))
    return qr, k, v, q_pos, kv_pos, rope_dim, fb


def test_prefill_matches_xla_float32():
    from blama_tpu.ops.pallas.decode_attention import prefill_attention

    qr, k, v, q_pos, kv_pos, rd, fb = _setup_prefill()
    ref = attention(qr, k, v, q_pos, kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = prefill_attention(qr, k, v, q_pos, kv_pos, invf, mscale=ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_prefill_matches_xla_int8_kv():
    from blama_tpu.ops.pallas.decode_attention import prefill_attention

    qr, k, v, q_pos, kv_pos, rd, fb = _setup_prefill(seed=11)
    kc, ks = quantize_kv(k)
    vc, vs = quantize_kv(v)
    ref = attention(qr, dequantize_kv(kc, ks), dequantize_kv(vc, vs),
                    q_pos, kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = prefill_attention(qr, kc, vc, q_pos, kv_pos, invf,
                            k_scale=ks, v_scale=vs, mscale=ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_prefill_matches_xla_bf16_partial_rope():
    from blama_tpu.ops.pallas.decode_attention import prefill_attention

    qr, k, v, q_pos, kv_pos, rd, fb = _setup_prefill(rope_dim=32, seed=12)
    qb, kb, vb = (a.astype(jnp.bfloat16) for a in (qr, k, v))
    ref = attention(qb, kb, vb, q_pos, kv_pos, rd, fb)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = prefill_attention(qb, kb, vb, q_pos, kv_pos, invf, mscale=ms)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


def test_prefill_causality_within_chunk():
    """Every query must see exactly its own prefix: compare against per-row
    decode_attention on a cache truncated to that row's visible set."""
    from blama_tpu.ops.pallas.decode_attention import (
        decode_attention, prefill_attention,
    )

    qr, k, v, q_pos, kv_pos, rd, fb = _setup_prefill(B=1, T=8, prior=4, seed=13)
    invf, ms = effective_inv_freq(rd, qr.shape[-1], fb)
    out = prefill_attention(qr, k, v, q_pos, kv_pos, invf, mscale=ms)
    for t in range(8):
        # mask cache slots beyond this query's position
        pos_t = np.asarray(kv_pos).copy()
        pos_t[pos_t > int(q_pos[0, t])] = -1
        one = decode_attention(
            qr[:, t:t + 1], k, v, q_pos[:, t], jnp.asarray(pos_t), invf,
            mscale=ms)
        np.testing.assert_allclose(
            np.asarray(out[:, t:t + 1]), np.asarray(one), atol=3e-6)


def test_prefill_supports_gate():
    from blama_tpu.ops.pallas.decode_attention import prefill_supports

    assert prefill_supports(16, 128, 64, jnp.float32)
    assert not prefill_supports(1, 128, 64, jnp.float32)    # decode path
    assert not prefill_supports(7, 128, 64, jnp.float32)    # no T block
    assert not prefill_supports(16, 31, 64, jnp.float32)    # no S block


def test_fused_prefill_session_matches_xla_engine(gguf_path):
    """flash_attn sessions with multi-token prompts (fused prefill + fused
    decode) produce the same greedy stream as the XLA engine, and replay
    bit-exactly against themselves with INT8 KV."""
    long_prompt = "the cat sat on the mat and the dog ran over the hill"

    def run(flash, kv="float32"):
        m = Model(gguf_path, ModelParams(dtype="float32"))
        inst = Instance(m, InstanceInitParams(
            ctx_size=64, flash_attn=flash, kv_dtype=kv, fast_greedy=False))
        s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
        s.set_initial_prompt(m.vocab.tokenize(long_prompt, True, True))
        preds = s.complete(CompleteParams(max_tokens=8))
        inst.stop_session()
        m.close()
        return preds

    base, fused = run(False), run(True)
    assert [p.token for p in base] == [p.token for p in fused]

    preds = run(True, kv="int8")
    m = Model(gguf_path, ModelParams(dtype="float32"))
    inst = Instance(m, InstanceInitParams(
        ctx_size=64, flash_attn=True, kv_dtype="int8", fast_greedy=False))
    s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize(long_prompt, True, True))
    replayed = s.fill_ctx(preds)
    inst.stop_session()
    m.close()
    for o, r in zip(preds, replayed):
        assert [l.token for l in o.logits] == [l.token for l in r.logits]
        np.testing.assert_array_equal(
            np.asarray([l.logit for l in o.logits], np.float32),
            np.asarray([l.logit for l in r.logits], np.float32))


def test_matches_per_layer_stacked_float32():
    """The stacked `layer=` path (merged [L, B, S, Hkv*D] operands, BlockSpec
    layer indexing) is BIT-IDENTICAL to the per-layer call (ADVICE r3: the
    engine tests only hit this via the quantized unrolled forward)."""
    L = 3
    per, stk_k, stk_v = [], [], []
    setups = [_setup(seed=10 + i) for i in range(L)]
    qr, k, v, q_pos, kv_pos, rd, fb = setups[0]
    B, S, Hkv, D = k.shape
    invf, ms = effective_inv_freq(rd, D, fb)
    for i in range(L):
        ki, vi = setups[i][1], setups[i][2]
        stk_k.append(np.asarray(ki).reshape(B, S, Hkv * D))
        stk_v.append(np.asarray(vi).reshape(B, S, Hkv * D))
        per.append(np.asarray(decode_attention(
            qr, ki, vi, q_pos, kv_pos, invf, mscale=ms)))
    k_stacked = jnp.asarray(np.stack(stk_k))   # [L, B, S, Hkv*D]
    v_stacked = jnp.asarray(np.stack(stk_v))
    for i in range(L):
        out = decode_attention(qr, k_stacked, v_stacked, q_pos, kv_pos,
                               invf, mscale=ms, layer=i)
        np.testing.assert_array_equal(np.asarray(out), per[i])


def test_matches_per_layer_stacked_int8_kv():
    L = 2
    setups = [_setup(seed=20 + i) for i in range(L)]
    qr, k, v, q_pos, kv_pos, rd, fb = setups[0]
    B, S, Hkv, D = k.shape
    invf, ms = effective_inv_freq(rd, D, fb)
    per, ks_l, vs_l, kc_l, vc_l = [], [], [], [], []
    for i in range(L):
        kc, ks = quantize_kv(setups[i][1])
        vc, vs = quantize_kv(setups[i][2])
        kc_l.append(np.asarray(kc).reshape(B, S, Hkv * D))
        vc_l.append(np.asarray(vc).reshape(B, S, Hkv * D))
        ks_l.append(np.asarray(ks))
        vs_l.append(np.asarray(vs))
        per.append(np.asarray(decode_attention(
            qr, kc, vc, q_pos, kv_pos, invf, k_scale=ks, v_scale=vs,
            mscale=ms)))
    k_stacked = jnp.asarray(np.stack(kc_l))
    v_stacked = jnp.asarray(np.stack(vc_l))
    ks_stacked = jnp.asarray(np.stack(ks_l))   # [L, B, S, Hkv]
    vs_stacked = jnp.asarray(np.stack(vs_l))
    for i in range(L):
        out = decode_attention(qr, k_stacked, v_stacked, q_pos, kv_pos,
                               invf, k_scale=ks_stacked, v_scale=vs_stacked,
                               mscale=ms, layer=i)
        np.testing.assert_array_equal(np.asarray(out), per[i])


def test_write_kernel_bitexact_vs_xla_write(tmp_path):
    """Opt-in in-kernel KV write (BLAMA_ATTN_WRITE): the fast greedy loop
    with the write kernel produces bit-identical top-10 logits AND cache
    contents (codes + scales) to the XLA write-then-read session path, for
    int8 and bf16 KV. (Off by default in round 5 — enabling it slowed the
    neighboring matmul kernels on hardware — but the kernel must stay
    value-exact for future rounds.)"""
    import numpy as np

    from blama_tpu.gguf import GGMLType
    from blama_tpu.ops import generate_loop as gl
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path / "wk.gguf")
    write_tiny_llama(p, GGMLType.Q4_K,
                     spec=dict(n_layer=2, n_embd=1024, n_ff=2048,
                               n_head=8, n_head_kv=4))

    def run(fast, kv, write):
        prev = gl._WRITE_IN_KERNEL
        gl._WRITE_IN_KERNEL = write
        try:
            m = Model(p, ModelParams(dtype="q4k_a8", attn="fused"))
            inst = Instance(m, InstanceInitParams(
                ctx_size=256, kv_dtype=kv, flash_attn=True,
                fast_greedy=fast))
            s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
            s.set_initial_prompt(
                m.vocab.tokenize("hello world this is", True, True))
            preds = s.complete(CompleteParams(max_tokens=8))
            out = [(x.token, tuple((l.token, l.logit) for l in x.logits))
                   for x in preds]
            ck = np.asarray(inst.cache.k)
            cs = (None if inst.cache.k_scale is None
                  else np.asarray(inst.cache.k_scale))
            inst.stop_session()
            m.close()
            return out, ck, cs
        finally:
            gl._WRITE_IN_KERNEL = prev

    for kv in ("int8", "bfloat16"):
        fast, ck_f, cs_f = run(True, kv, write=True)
        slow, ck_s, cs_s = run(False, kv, write=False)
        assert fast == slow
        assert np.array_equal(ck_f, ck_s)
        assert cs_f is None or np.array_equal(cs_f, cs_s)


def test_fresh_operand_mode_bitexact(tmp_path):
    """Fresh-operand attention (BLAMA_ATTN_FRESH: the fused kernel takes the
    just-projected K/V row as an operand and patches it at the row's slot,
    taking the XLA cache writes off the critical path) must be bit-exact vs
    the write-then-read fast loop AND the host per-token path: same tokens,
    same top-10 logits, same final cache codes and scales."""
    from blama_tpu.ops import generate_loop as gl

    p = str(tmp_path / "fresh.gguf")
    # head_dim 128 so fresh_supports passes (the in-kernel [1, Hkv*D] ->
    # [Hkv, D] reshape needs 128 lanes)
    write_tiny_llama(p, GGMLType.Q4_K,
                     spec=dict(n_layer=2, n_embd=1024, n_ff=2048,
                               n_head=8, n_head_kv=4))

    def run(fast, fresh):
        prev = gl._FRESH_OPERAND
        gl._FRESH_OPERAND = fresh
        try:
            m = Model(p, ModelParams(dtype="q4k_a8", attn="fused"))
            inst = Instance(m, InstanceInitParams(
                ctx_size=256, kv_dtype="int8", flash_attn=True,
                fast_greedy=fast))
            s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
            s.set_initial_prompt(
                m.vocab.tokenize("hello world this is", True, True))
            preds = s.complete(CompleteParams(max_tokens=8))
            out = [(x.token, tuple((l.token, l.logit) for l in x.logits))
                   for x in preds]
            ck = np.asarray(inst.cache.k)
            cs = np.asarray(inst.cache.k_scale)
            inst.stop_session()
            m.close()
            return out, ck, cs
        finally:
            gl._FRESH_OPERAND = prev

    fresh, ck_f, cs_f = run(True, fresh=True)
    plain, ck_p, cs_p = run(True, fresh=False)
    host, ck_h, cs_h = run(False, fresh=False)
    assert fresh == plain == host
    assert np.array_equal(ck_f, ck_p) and np.array_equal(ck_f, ck_h)
    assert np.array_equal(cs_f, cs_p) and np.array_equal(cs_f, cs_h)
