"""GPT-2 architecture + byte-level BPE tokenizer tests (the reference's
default/test model is a Q6_K GPT-2, t-integration.cpp:23)."""

import pytest

from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.runtime.vocab import _gpt2_pretokenize
from blama_tpu.testing import write_tiny_gpt2


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("g") / "g.gguf")
    write_tiny_gpt2(p)
    m = Model(p)
    yield m
    m.close()


def test_gpt2_pretokenizer():
    assert _gpt2_pretokenize("hello world") == ["hello", " world"]
    assert _gpt2_pretokenize("I'm fine, thanks!") == ["I", "'m", " fine", ",", " thanks", "!"]
    assert _gpt2_pretokenize("abc  def") == ["abc", " ", " def"]
    assert _gpt2_pretokenize("x123y") == ["x", "123", "y"]


def test_bpe_tokenize_merges(model):
    v = model.vocab
    toks = v.tokenize("hello world", False, False)
    pieces = [v.tokens[t] for t in toks]
    assert pieces[0] == "hello"
    assert pieces[1] == "Ġworld"
    assert v.detokenize(toks) == "hello world"


def test_bpe_byte_fallback_roundtrip(model):
    v = model.vocab
    text = "Zq# 9\n"
    toks = v.tokenize(text, False, False)
    assert v.detokenize(toks) == text


def test_bpe_special_token_parse(model):
    v = model.vocab
    toks = v.tokenize("hello<|endoftext|>world", False, True)
    assert v.eos() in toks


def test_gpt2_generation_and_replay(model):
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=3, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize("hello world", False, True))
    preds = s.complete(CompleteParams(max_tokens=5))
    inst.stop_session()
    assert len(preds) >= 1

    s2 = inst.start_session(SessionInitParams(seed=3, temperature=0.0))
    s2.set_initial_prompt(model.vocab.tokenize("hello world", False, True))
    replayed = s2.fill_ctx(preds)
    inst.stop_session()
    for o, r in zip(preds, replayed):
        assert {td.token: td.logit for td in o.logits} == {td.token: td.logit for td in r.logits}


def test_bpe_unicode_roundtrip(model):
    v = model.vocab
    for text in ["héllo wörld", "日本語テスト", "🚀 emoji!", "mixed 🎉 text"]:
        toks = v.tokenize(text, False, False)
        assert v.detokenize(toks) == text
