"""Perplexity tool tests: sanity bounds and cross-dtype closeness."""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.model import Model, ModelParams
from blama_tpu.testing import write_tiny_llama
from blama_tpu.tools.perplexity import perplexity


@pytest.fixture(scope="module")
def path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ppl") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    return p


def test_perplexity_bounds(path):
    m = Model(path)
    toks = m.vocab.tokenize("the cat sat hello world " * 20, True, False)
    r = perplexity(m, toks, ctx=64)
    assert 1.0 < r["ppl"] < m.vocab.n_tokens * 10
    assert r["count"] > 0
    m.close()


def test_perplexity_dtype_closeness(path):
    """bf16 and f32 engines agree on PPL within a small delta (the
    north-star bit-width acceptance pattern, BASELINE.json)."""
    toks = None
    vals = {}
    for dtype in ("float32", "bfloat16"):
        m = Model(path, ModelParams(dtype=dtype))
        if toks is None:
            toks = m.vocab.tokenize("hello world the cat sat " * 10, True, False)
        vals[dtype] = perplexity(m, toks, ctx=32)["ppl"]
        m.close()
    assert vals["bfloat16"] == pytest.approx(vals["float32"], rel=0.02)
