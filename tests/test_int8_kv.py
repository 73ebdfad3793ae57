"""INT8 KV-cache tests: accuracy vs float KV, determinism, replay, and state
save/restore (north-star requirement, BASELINE.json)."""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.ops.kv_cache import dequantize_kv, quantize_kv
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("i8") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p)
    yield m
    m.close()


def test_quantize_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 64)).astype(np.float32))
    codes, scale = quantize_kv(x)
    assert codes.dtype == jnp.int8
    y = dequantize_kv(codes, scale)
    rel = np.abs(np.asarray(y) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.01


def _generate(model, kv_dtype, n=8, seed=5):
    inst = Instance(model, InstanceInitParams(ctx_size=64, kv_dtype=kv_dtype))
    s = inst.start_session(SessionInitParams(seed=seed, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize("the cat sat", True, True))
    preds = s.complete(CompleteParams(max_tokens=n))
    inst.stop_session()
    return preds


def test_int8_kv_generation_quality(model):
    """INT8 KV generation agrees with float KV on the tiny model (greedy
    token stream identical here; logit drift small)."""
    pf = _generate(model, "float32")
    pi = _generate(model, "int8")
    assert [p.token for p in pf] == [p.token for p in pi]
    for a, b in zip(pf, pi):
        la = {t.token: t.logit for t in a.logits}
        lb = {t.token: t.logit for t in b.logits}
        common = set(la) & set(lb)
        assert len(common) >= 8  # top-10 sets nearly identical
        for t in common:
            assert abs(la[t] - lb[t]) < 0.05


def test_int8_kv_deterministic_replay(model):
    """fillCtx replay with INT8 KV is bit-exact (same quantization applied)."""
    inst = Instance(model, InstanceInitParams(ctx_size=64, kv_dtype="int8"))
    s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    preds = s.complete(CompleteParams(max_tokens=6))
    inst.stop_session()

    s2 = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s2.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    replayed = s2.fill_ctx(preds)
    inst.stop_session()
    for o, r in zip(preds, replayed):
        assert {t.token: t.logit for t in o.logits} == {t.token: t.logit for t in r.logits}


def test_int8_kv_state_save_restore(model):
    inst = Instance(model, InstanceInitParams(ctx_size=64, kv_dtype="int8"))
    s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize("hello", True, True))
    state = s.get_state()
    original = [p.token for p in s.complete(CompleteParams(max_tokens=5))]
    inst.stop_session()

    s2 = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s2.set_state(state)
    restored = [p.token for p in s2.complete(CompleteParams(max_tokens=5))]
    inst.stop_session()
    assert original == restored
