"""qwen2-family test: attention biases + tied embeddings + replay."""

import pytest

from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_qwen2


def test_qwen2_generation_and_replay(tmp_path):
    p = str(tmp_path / "q.gguf")
    write_tiny_qwen2(p)
    m = Model(p)
    assert m.config.arch == "qwen2"
    assert "bq" in m.weights["layers"]  # bias path active
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=6, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
    preds = s.complete(CompleteParams(max_tokens=5))
    inst.stop_session()
    assert len(preds) >= 1

    s2 = inst.start_session(SessionInitParams(seed=6, temperature=0.0))
    s2.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
    replayed = s2.fill_ctx(preds)
    inst.stop_session()
    for o, r in zip(preds, replayed):
        assert {t.token: t.logit for t in o.logits} == {t.token: t.logit for t in r.logits}
    m.close()
