"""Cross-engine verification replay: generate on one engine configuration,
verify on another, score with the reference's acceptance thresholds.

This is the TPU analog of the reference's cross-backend test (CUDA generate →
CPU verify must reach aggregate score ≥ 0.95 and mean per-token similarity
≥ 0.98, t-LogitComparer.cpp:41-79). Engine configurations differ in weight
numerics (bf16 dequant vs float32 vs W4A8 int8 activations), exactly like
CUDA-vs-CPU kernels differ.
"""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model, ModelParams
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.runtime.verify import LogitComparer, MetricsAggregator
from blama_tpu.testing import write_tiny_llama


@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("x") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q4_K)
    return p


def _generate(path, dtype, prompt, n):
    m = Model(path, ModelParams(dtype=dtype))
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=11, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize(prompt, True, True))
    preds = s.complete(CompleteParams(max_tokens=n))
    inst.stop_session()
    m.close()
    return preds


def _verify(path, dtype, prompt, preds):
    m = Model(path, ModelParams(dtype=dtype))
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=11, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize(prompt, True, True))
    replayed = s.fill_ctx(preds)
    inst.stop_session()
    m.close()
    agg = MetricsAggregator()
    score = 0.0
    sims = []
    for o, r in zip(preds, replayed):
        score = agg.push_and_verify(LogitComparer.compare(o.logits, r.logits))
        sims.append(LogitComparer.logit_similarity(o.logits, r.logits))
    return score, float(np.mean(sims))


@pytest.mark.parametrize("gen_dtype,ver_dtype", [
    ("float32", "bfloat16"),
    ("bfloat16", "float32"),
    ("bfloat16", "q4k_a8"),
])
def test_cross_engine_replay_meets_thresholds(gguf_path, gen_dtype, ver_dtype):
    prompt = "the cat sat"
    preds = _generate(gguf_path, gen_dtype, prompt, 12)
    score, mean_sim = _verify(gguf_path, ver_dtype, prompt, preds)
    # reference acceptance thresholds (t-LogitComparer.cpp:76-78)
    assert score >= 0.95, f"{gen_dtype}->{ver_dtype}: score {score}"
    assert mean_sim >= 0.98, f"{gen_dtype}->{ver_dtype}: similarity {mean_sim}"


def test_same_engine_is_perfect(gguf_path):
    prompt = "hello world"
    preds = _generate(gguf_path, "float32", prompt, 8)
    score, mean_sim = _verify(gguf_path, "float32", prompt, preds)
    assert score == pytest.approx(1.0, abs=1e-9)
    assert mean_sim == pytest.approx(1.0, abs=1e-9)
