"""Device-loop fast-path tests: equivalence with the step-by-step path in
tokens, captured logits, and post-call session state."""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fg") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p)
    yield m
    m.close()


def _run(model, fast, n=8, prompt="hello world", then_push=False):
    inst = Instance(model, InstanceInitParams(ctx_size=64, fast_greedy=fast))
    s = inst.start_session(SessionInitParams(seed=1, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize(prompt, True, True))
    preds = s.complete(CompleteParams(max_tokens=n))
    extra = []
    if then_push:
        s.push_prompt(model.vocab.tokenize("the cat", False, False))
        extra = [p.token for p in s.complete(CompleteParams(max_tokens=4))]
    inst.stop_session()
    return preds, extra


def test_fast_matches_slow_tokens_and_logits(model):
    fast, _ = _run(model, True)
    slow, _ = _run(model, False)
    assert [p.token for p in fast] == [p.token for p in slow]
    for a, b in zip(fast, slow):
        assert {t.token: t.logit for t in a.logits} == {t.token: t.logit for t in b.logits}


def test_fast_path_state_continues_identically(model):
    """Session state after a fast complete() supports continued interaction
    identically to the slow path (cache/positions bookkeeping)."""
    f1, fe = _run(model, True, then_push=True)
    s1, se = _run(model, False, then_push=True)
    assert [p.token for p in f1] == [p.token for p in s1]
    assert fe == se


def test_fast_path_replay_bitexact(model):
    """Fast-path captured logits replay bit-exactly through the slow-path
    fillCtx verifier (the capture/verify contract)."""
    inst = Instance(model, InstanceInitParams(ctx_size=64, fast_greedy=True))
    s = inst.start_session(SessionInitParams(seed=1, temperature=0.0))
    prompt = model.vocab.tokenize("president george", True, True)
    s.set_initial_prompt(prompt)
    preds = s.complete(CompleteParams(max_tokens=8))
    inst.stop_session()

    inst2 = Instance(model, InstanceInitParams(ctx_size=64, fast_greedy=False))
    s2 = inst2.start_session(SessionInitParams(seed=1, temperature=0.0))
    s2.set_initial_prompt(prompt)
    replayed = s2.fill_ctx(preds)
    inst2.stop_session()
    for o, r in zip(preds, replayed):
        assert {t.token: t.logit for t in o.logits} == {t.token: t.logit for t in r.logits}


def test_sampled_params_fall_back(model):
    """Non-greedy params must not take the fast path (behavioral check: the
    stochastic stream is produced by the host sampler chain)."""
    inst = Instance(model, InstanceInitParams(ctx_size=64, fast_greedy=True))
    s = inst.start_session(SessionInitParams(seed=3, temperature=1.2))
    s.set_initial_prompt(model.vocab.tokenize("hello", True, True))
    p1 = [p.token for p in s.complete(CompleteParams(max_tokens=6))]
    inst.stop_session()

    inst2 = Instance(model, InstanceInitParams(ctx_size=64, fast_greedy=False))
    s2 = inst2.start_session(SessionInitParams(seed=3, temperature=1.2))
    s2.set_initial_prompt(model.vocab.tokenize("hello", True, True))
    p2 = [p.token for p in s2.complete(CompleteParams(max_tokens=6))]
    inst2.stop_session()
    assert p1 == p2


def test_fast_path_falls_back_after_context_shift(model):
    """After a context-shift edit the slot layout is non-sequential; the fast
    path must bail and the slow path must continue correctly."""
    from blama_tpu.runtime.sampler import SamplerParams

    inst = Instance(model, InstanceInitParams(ctx_size=32, fast_greedy=True))
    s = inst.start_session(SessionInitParams(seed=1, temperature=0.0, infinite_context=True))
    s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    bias = {t: -1e9 for t in range(model.vocab.n_tokens) if model.vocab.is_eog(t)}
    s.reset_sampler(SamplerParams(temp=0.0, logit_bias=bias))
    preds = s.complete(CompleteParams(max_tokens=48))  # crosses the ctx limit
    inst.stop_session()
    assert len(preds) > 30
