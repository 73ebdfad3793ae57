"""InstanceEmbedding tests: pooling modes, normalization semantics, and
determinism golden (mirrors t-integration.cpp:511-530's embeddings coverage)."""

import numpy as np
import pytest

from blama_tpu.runtime.embedding import (
    EmbeddingInitParams,
    InstanceEmbedding,
    normalize_embedding,
)
from blama_tpu.runtime.model import Model
from blama_tpu.testing import write_tiny_bert, write_tiny_llama


@pytest.fixture(scope="module")
def bert_model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("b") / "bert.gguf")
    write_tiny_bert(p, pooling_type=2)
    m = Model(p)
    yield m
    m.close()


def test_normalize_modes():
    v = np.array([3.0, -4.0], np.float64)
    np.testing.assert_allclose(normalize_embedding(v, -1), v)
    # euclidean: norm 5
    np.testing.assert_allclose(normalize_embedding(v, 2), [0.6, -0.8])
    # max-abs int16: scale = 4/32760
    np.testing.assert_allclose(
        normalize_embedding(v, 0), v / (4.0 / 32760.0), rtol=1e-6
    )
    # p-norm p=1: sum abs = 7
    np.testing.assert_allclose(normalize_embedding(v, 1), v / 7.0)
    # zero vector stays zero
    np.testing.assert_allclose(normalize_embedding(np.zeros(4), 2), np.zeros(4))


def test_bert_embedding_shape_and_determinism(bert_model):
    inst = InstanceEmbedding(bert_model)
    assert inst.embedding_dim() == 64
    toks = bert_model.vocab.tokenize("hello world", False, False)
    e1 = inst.get_embedding_vector(toks)
    e2 = inst.get_embedding_vector(toks)
    assert e1.shape == (64,)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, rtol=1e-5)


def test_bert_embedding_distinguishes_inputs(bert_model):
    inst = InstanceEmbedding(bert_model)
    a = inst.get_embedding_vector(bert_model.vocab.tokenize("hello world", False, False))
    b = inst.get_embedding_vector(bert_model.vocab.tokenize("the the the", False, False))
    assert np.abs(a - b).max() > 1e-3


def test_decoder_embedding(tmp_path):
    p = str(tmp_path / "l.gguf")
    from blama_tpu.gguf import GGMLType

    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p)
    inst = InstanceEmbedding(m)
    toks = m.vocab.tokenize("hello world", True, True)
    e = inst.get_embedding_vector(toks, normalization=2)
    assert e.shape == (m.config.n_embd,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-5)
    m.close()


def test_unnormalized_embedding(bert_model):
    inst = InstanceEmbedding(bert_model)
    toks = bert_model.vocab.tokenize("hello", False, False)
    raw = inst.get_embedding_vector(toks, normalization=-1)
    assert abs(np.linalg.norm(raw) - 1.0) > 1e-3  # genuinely unnormalized
