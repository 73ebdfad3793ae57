"""gemma + phi3 family tests: architecture-specific loading/forward quirks
plus the standard generation/replay contract."""

import pytest

from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_gemma, write_tiny_phi3


def _roundtrip(path):
    m = Model(path)
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=8, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
    preds = s.complete(CompleteParams(max_tokens=5))
    inst.stop_session()
    assert len(preds) >= 1

    s2 = inst.start_session(SessionInitParams(seed=8, temperature=0.0))
    s2.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
    replayed = s2.fill_ctx(preds)
    inst.stop_session()
    for o, r in zip(preds, replayed):
        assert {t.token: t.logit for t in o.logits} == {t.token: t.logit for t in r.logits}
    return m


def test_gemma(tmp_path):
    p = str(tmp_path / "g.gguf")
    write_tiny_gemma(p)
    m = _roundtrip(p)
    assert m.config.emb_scale == pytest.approx(128 ** 0.5)
    assert m.config.norm_plus_one
    assert m.config.head_dim_ == 64  # attention.key_length, not E/H
    m.close()


def test_phi3_fused_tensors(tmp_path):
    p = str(tmp_path / "p.gguf")
    write_tiny_phi3(p)
    m = _roundtrip(p)
    # fused qkv/gate_up were split into the standard layout
    assert m.weights["layers"]["wq"].shape == (2, 256, 256)
    assert m.weights["layers"]["wk"].shape == (2, 256, 128)
    assert m.weights["layers"]["w_gate"].shape == (2, 256, 512)
    assert m.weights["layers"]["w_up"].shape == (2, 256, 512)
    m.close()
