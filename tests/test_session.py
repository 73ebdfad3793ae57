"""Session/Instance integration tests on a tiny real quantized model.

Mirrors the reference test strategy (t-integration.cpp, SURVEY.md §4):
golden-token generation, phase state-machine errors by exact message,
streaming, single-session enforcement, fillCtx bit-exactness, state
save/restore determinism semantics.
"""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model, ModelParams
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.runtime.token_data import TOKEN_INVALID
from blama_tpu.runtime.verify import LogitComparer, MetricsAggregator
from blama_tpu.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_llama(p, GGMLType.Q4_K)
    m = Model(p)
    yield m
    m.close()


@pytest.fixture
def instance(model):
    return Instance(model, InstanceInitParams(ctx_size=128))


def greedy(seed=42):
    return SessionInitParams(seed=seed, temperature=0.0)


def _no_eog_params(model):
    """Greedy sampler with EOG tokens suppressed (for long-generation tests)."""
    from blama_tpu.runtime.sampler import SamplerParams

    bias = {t: -1e9 for t in range(model.vocab.n_tokens) if model.vocab.is_eog(t)}
    return SamplerParams(temp=0.0, logit_bias=bias)


def test_vocab_only_load(tmp_path):
    p = str(tmp_path / "v.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p, ModelParams(vocab_only=True))
    assert m.weights is None
    assert m.vocab.n_tokens > 256
    toks = m.vocab.tokenize("hello world", True, True)
    assert toks[0] == m.vocab.bos()
    assert m.vocab.detokenize(toks[1:]) == " hello world"
    m.close()


def test_greedy_generation_deterministic(model, instance):
    """Same prompt + greedy → identical tokens across sessions (the analog of
    the reference's golden-continuation tests, t-integration.cpp:66-90)."""
    prompt = model.vocab.tokenize("the cat sat", True, True)

    s = instance.start_session(greedy())
    s.set_initial_prompt(prompt)
    first = [p.token for p in s.complete(CompleteParams(max_tokens=10))]
    instance.stop_session()

    s2 = instance.start_session(greedy())
    s2.set_initial_prompt(prompt)
    second = [p.token for p in s2.complete(CompleteParams(max_tokens=10))]
    instance.stop_session()

    assert len(first) > 0
    assert first == second


def test_phase_state_machine_errors(model, instance):
    s = instance.start_session(greedy())
    with pytest.raises(RuntimeError, match="Session hasn't started yet"):
        s.complete()
    with pytest.raises(RuntimeError, match="Session hasn't started yet"):
        s.push_prompt([1])
    with pytest.raises(RuntimeError, match="Session hasn't started yet"):
        s.get_token()
    s.set_initial_prompt(model.vocab.tokenize("hello", True, True))
    with pytest.raises(RuntimeError, match="Session already started"):
        s.set_initial_prompt([1])
    with pytest.raises(RuntimeError, match="Prompt and postfix are empty"):
        s.push_prompt([])
    instance.stop_session()


def test_initial_prompt_too_long(model, instance):
    s = instance.start_session(greedy())
    with pytest.raises(RuntimeError, match="Initial prompt too long"):
        s.set_initial_prompt(list(range(3, 200)) * 2)
    instance.stop_session()


def test_single_session_enforcement(model, instance):
    instance.start_session(greedy())
    with pytest.raises(RuntimeError, match="Another session is currently active"):
        instance.start_session(greedy())
    instance.stop_session()


def test_streaming_matches_complete(model, instance):
    prompt = model.vocab.tokenize("hello world", True, True)
    s = instance.start_session(greedy())
    s.set_initial_prompt(prompt)
    batch = [p.token for p in s.complete(CompleteParams(max_tokens=6))]
    instance.stop_session()

    s2 = instance.start_session(greedy())
    s2.set_initial_prompt(prompt)
    gen = s2.complete_stream(CompleteParams(max_tokens=6))
    streamed = [p.token for p in gen]
    instance.stop_session()
    assert batch == streamed


def test_stream_abort(model, instance):
    s = instance.start_session(greedy())
    s.set_initial_prompt(model.vocab.tokenize("hello", True, True))
    gen = s.complete_stream(CompleteParams(max_tokens=100))
    p = gen.complete()
    assert p.token != TOKEN_INVALID
    gen.abort()
    p2 = gen.complete()
    assert p2.token == TOKEN_INVALID
    instance.stop_session()


def test_top10_logit_capture(model, instance):
    s = instance.start_session(greedy())
    s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    preds = s.complete(CompleteParams(max_tokens=3))
    instance.stop_session()
    for p in preds:
        assert len(p.logits) == 10
        vals = [td.logit for td in p.logits]
        assert vals == sorted(vals, reverse=True)
    # Captured logits are the post-decode distribution (the reference's
    # getToken evaluates .logits after flushing the sampled token,
    # Session.cpp:186-189 + 246-252), so under greedy decoding record i's
    # top-1 entry is record i+1's sampled token.
    for p, pnext in zip(preds, preds[1:]):
        assert p.logits[0].token == pnext.token


def test_fillctx_bitexact_same_backend(model, instance):
    """Verification replay recomputes bit-identical logits same-backend
    (reference: t-integration.cpp:219-248 checks float equality)."""
    prompt = model.vocab.tokenize("president george", True, True)
    s = instance.start_session(greedy())
    s.set_initial_prompt(prompt)
    preds = s.complete(CompleteParams(max_tokens=8))
    instance.stop_session()

    s2 = instance.start_session(greedy())
    s2.set_initial_prompt(prompt)
    replayed = s2.fill_ctx(preds)
    instance.stop_session()

    assert len(replayed) == len(preds)
    agg = MetricsAggregator()
    for orig, rep in zip(preds, replayed):
        assert rep.token == orig.token
        orig_map = {td.token: td.logit for td in orig.logits}
        rep_map = {td.token: td.logit for td in rep.logits}
        assert set(orig_map) == set(rep_map)
        for t in orig_map:
            assert orig_map[t] == rep_map[t], "same-backend replay must be bit-exact"
        m = LogitComparer.compare(orig.logits, rep.logits)
        assert m.top1_match == 1.0
        assert m.distance == 0.0
        assert abs(m.jsd) < 1e-12
        score = agg.push_and_verify(m)
    assert score == pytest.approx(1.0)


def test_sampler_seed_determinism(model, instance):
    """Same seed → same stochastic sample; different seed → (likely) different
    (reference: t-integration.cpp:92-120)."""
    prompt = model.vocab.tokenize("hello world", True, True)

    def run(seed):
        s = instance.start_session(SessionInitParams(seed=seed, temperature=1.5, top_p=1.0))
        s.set_initial_prompt(prompt)
        out = [p.token for p in s.complete(CompleteParams(max_tokens=12))]
        instance.stop_session()
        return out

    a = run(7)
    b = run(7)
    c = run(8)
    assert a == b
    assert a != c  # astronomically unlikely to collide over 12 tokens


def test_state_save_restore_initial(model, instance):
    """Restore-from-initial reproduces the exact continuation
    (t-integration.cpp:359-376)."""
    prompt = model.vocab.tokenize("the cat", True, True)
    s = instance.start_session(greedy())
    s.set_initial_prompt(prompt)
    state = s.get_state()
    original = [p.token for p in s.complete(CompleteParams(max_tokens=8))]
    instance.stop_session()

    s2 = instance.start_session(greedy())
    s2.set_state(state)
    restored = [p.token for p in s2.complete(CompleteParams(max_tokens=8))]
    instance.stop_session()
    assert original == restored


def test_state_restore_is_reproducible(model, instance):
    """Two restores from the same mid-generation state generate identically."""
    prompt = model.vocab.tokenize("hello", True, True)
    s = instance.start_session(greedy())
    s.set_initial_prompt(prompt)
    s.complete(CompleteParams(max_tokens=4))
    state = s.get_state()
    instance.stop_session()

    outs = []
    for _ in range(2):
        si = instance.start_session(greedy())
        si.set_state(state)
        outs.append([p.token for p in si.complete(CompleteParams(max_tokens=6))])
        instance.stop_session()
    assert outs[0] == outs[1]


def test_context_shift_infinite_context(model):
    """Generation beyond ctx_len succeeds with infinite_context (context-shift
    drops half of the non-kept tokens; Session.cpp:324-347)."""
    inst = Instance(model, InstanceInitParams(ctx_size=32))
    s = inst.start_session(SessionInitParams(seed=1, temperature=0.0, infinite_context=True))
    s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    s.reset_sampler(_no_eog_params(model))
    preds = s.complete(CompleteParams(max_tokens=48))
    inst.stop_session()
    assert len(preds) > 30  # got well past the raw context limit


def test_context_limit_without_infinite(model):
    inst = Instance(model, InstanceInitParams(ctx_size=32))
    s = inst.start_session(SessionInitParams(seed=1, temperature=0.0, infinite_context=False))
    s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    s.reset_sampler(_no_eog_params(model))
    with pytest.raises(RuntimeError, match="context limit of 32 reached"):
        s.complete(CompleteParams(max_tokens=64))
    inst.stop_session()


def test_self_extend_group_attention(model):
    """gaFactor>1 path runs and generates past ga_width (Session.cpp:348-368)."""
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    s = inst.start_session(
        SessionInitParams(seed=1, temperature=0.0, ga_factor=2, ga_width=16)
    )
    s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    s.reset_sampler(_no_eog_params(model))
    preds = s.complete(CompleteParams(max_tokens=40))
    inst.stop_session()
    assert len(preds) > 20


def test_ga_width_validation(model, instance):
    s = instance.start_session(SessionInitParams(ga_factor=3, ga_width=16))
    with pytest.raises(RuntimeError, match="must be a multiple of"):
        s.set_initial_prompt([3, 4, 5])
    instance.stop_session()


def test_empty_prompt_uses_bos(model, instance):
    s = instance.start_session(greedy())
    s.set_initial_prompt([])
    preds = s.complete(CompleteParams(max_tokens=2))
    instance.stop_session()
    assert len(preds) >= 1


def test_fim_infill_assembly(model, instance, monkeypatch):
    """pushPrompt with a postfix assembles FIM framing:
    [pre] prefix [suf] suffix [mid] (Session.cpp:142-159)."""
    v = model.vocab
    assert v.fim_pre() >= 0 and v.fim_suf() >= 0 and v.fim_mid() >= 0
    s = instance.start_session(greedy())
    s.set_initial_prompt(v.tokenize("hello", True, True))

    decoded: list[int] = []
    orig = s._do_decode

    def spy(tokens, generated):
        decoded.extend(tokens)
        return orig(tokens, generated)

    monkeypatch.setattr(s, "_do_decode", spy)
    prefix = v.tokenize("the cat", False, False)
    suffix = v.tokenize("sat", False, False)
    s.push_prompt(prefix, suffix)
    expected = [v.fim_pre()] + prefix + [v.fim_suf()] + suffix + [v.fim_mid()]
    assert decoded == expected
    instance.stop_session()


def test_suffix_via_complete_params(model, instance):
    s = instance.start_session(greedy())
    s.set_initial_prompt(model.vocab.tokenize("hello", True, True))
    preds = s.complete(CompleteParams(
        prompt=model.vocab.tokenize("the", False, False),
        suffix=model.vocab.tokenize("cat", False, False),
        max_tokens=3,
    ))
    assert len(preds) >= 1
    instance.stop_session()


def test_state_with_sampler_rng_continues_original_stream(model, instance):
    """include_sampler_rng=True fixes the reference's quirk: the restored
    session continues the ORIGINAL stochastic stream."""
    from blama_tpu.runtime.session import SessionInitParams as SIP

    prompt = model.vocab.tokenize("hello world", True, True)
    s = instance.start_session(SIP(seed=21, temperature=1.5, top_p=1.0))
    s.set_initial_prompt(prompt)
    s.complete(CompleteParams(max_tokens=4))
    state = s.get_state(include_sampler_rng=True)
    original_rest = [p.token for p in s.complete(CompleteParams(max_tokens=6))]
    instance.stop_session()

    s2 = instance.start_session(SIP(seed=21, temperature=1.5, top_p=1.0))
    s2.set_state(state)
    restored_rest = [p.token for p in s2.complete(CompleteParams(max_tokens=6))]
    instance.stop_session()
    assert restored_rest == original_rest


def test_spm_unicode_byte_fallback(model, instance):
    """Unknown unicode falls back to byte tokens and detokenizes losslessly."""
    v = model.vocab
    for text in ["héllo", "日本", "🚀"]:
        toks = v.tokenize(text, False, False)
        # leading SPM space prefix is part of llama.cpp semantics
        out = v.detokenize(toks)
        assert text in out.replace("▁", " ")
