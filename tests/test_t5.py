"""T5 encoder-decoder tests: the has_encoder Session path
(Session.cpp:94-103), decoder start token, generation + replay."""

import pytest

from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_t5


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("t5") / "t5.gguf")
    write_tiny_t5(p)
    m = Model(p)
    yield m
    m.close()


def test_t5_config(model):
    assert model.has_encoder()
    assert model.config.extra["rel_buckets"] == 8
    assert model.vocab.decoder_start_token() == 0  # t5.decoder_start_token_id


def test_t5_generation_deterministic(model):
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    inst.warmup()

    outs = []
    for _ in range(2):
        s = inst.start_session(SessionInitParams(seed=2, temperature=0.0))
        s.set_initial_prompt(model.vocab.tokenize("hello world", False, True))
        outs.append([p.token for p in s.complete(CompleteParams(max_tokens=5))])
        inst.stop_session()
    assert outs[0] == outs[1]
    assert len(outs[0]) >= 1


def test_t5_replay_bitexact(model):
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    prompt = model.vocab.tokenize("the cat sat", False, True)
    s = inst.start_session(SessionInitParams(seed=2, temperature=0.0))
    s.set_initial_prompt(prompt)
    preds = s.complete(CompleteParams(max_tokens=4))
    inst.stop_session()

    s2 = inst.start_session(SessionInitParams(seed=2, temperature=0.0))
    s2.set_initial_prompt(prompt)
    replayed = s2.fill_ctx(preds)
    inst.stop_session()
    for o, r in zip(preds, replayed):
        assert {t.token: t.logit for t in o.logits} == {t.token: t.logit for t in r.logits}


def test_t5_gated_ffn(tmp_path):
    p = str(tmp_path / "t5g.gguf")
    write_tiny_t5(p, gated=True)
    m = Model(p)
    assert m.config.extra["gated_ffn"]
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=1, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize("hello", False, True))
    preds = s.complete(CompleteParams(max_tokens=3))
    inst.stop_session()
    assert len(preds) >= 1
    m.close()
