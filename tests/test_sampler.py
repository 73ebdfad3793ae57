"""Sampler chain unit tests: primitive semantics + chain determinism,
covering the Sampler::Params surface (Sampler.hpp:34-77)."""

import numpy as np
import pytest

from blama_tpu.runtime.sampler import (
    Mirostat,
    RepetitionPenalty,
    Sampler,
    SamplerParams,
    SamplingType,
    XTC,
)
from blama_tpu.runtime.vocab import Vocab, TT_CONTROL, TT_NORMAL


@pytest.fixture(scope="module")
def vocab():
    tokens = ["<unk>", "<s>", "</s>"] + [f"t{i}" for i in range(61)]
    types = [2, 3, 3] + [TT_NORMAL] * 61
    return Vocab(tokens=tokens, scores=[0.0] * 64, token_types=types,
                 model="llama", bos_id=1, eos_id=2, unk_id=0)


def make_logits(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32) * 3


def test_greedy_temp_zero(vocab):
    s = Sampler(vocab, SamplerParams(temp=0.0))
    lg = make_logits()
    assert s.sample(lg) == int(np.argmax(lg))


def test_seed_determinism(vocab):
    lg = make_logits()
    picks1 = []
    picks2 = []
    s1 = Sampler(vocab, SamplerParams(temp=1.0, rng_seed=123, top_p=1.0, min_p=0.0))
    s2 = Sampler(vocab, SamplerParams(temp=1.0, rng_seed=123, top_p=1.0, min_p=0.0))
    for _ in range(20):
        picks1.append(s1.sample(lg))
        picks2.append(s2.sample(lg))
    assert picks1 == picks2
    s3 = Sampler(vocab, SamplerParams(temp=1.0, rng_seed=999, top_p=1.0, min_p=0.0))
    picks3 = [s3.sample(lg) for _ in range(20)]
    assert picks3 != picks1


def test_top_k_restricts(vocab):
    lg = make_logits()
    top5 = set(np.argsort(-lg)[:5].tolist())
    s = Sampler(vocab, SamplerParams(temp=2.0, top_k=5, top_p=1.0, min_p=0.0, rng_seed=7))
    for _ in range(50):
        assert s.sample(lg) in top5


def test_top_p_keeps_nucleus(vocab):
    lg = np.full(64, -10.0, np.float32)
    lg[3] = 10.0
    lg[4] = 9.0
    s = Sampler(vocab, SamplerParams(temp=1.0, top_k=0, top_p=0.9, min_p=0.0, rng_seed=5))
    for _ in range(30):
        assert s.sample(lg) in (3, 4)


def test_min_p_threshold(vocab):
    lg = np.full(64, 0.0, np.float32)
    lg[0] = 8.0  # dominates: p(others)/p(max) = e^-8 << 0.05
    s = Sampler(vocab, SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.05, rng_seed=3))
    for _ in range(20):
        assert s.sample(lg) == 0


def test_logit_bias(vocab):
    lg = make_logits()
    target = int(np.argmin(lg))
    s = Sampler(vocab, SamplerParams(temp=0.0, logit_bias={target: 1000.0}))
    assert s.sample(lg) == target


def test_repetition_penalty(vocab):
    lg = np.zeros(64, np.float32)
    lg[10] = 5.0
    lg[11] = 4.9
    p = SamplerParams(temp=0.0,
                      repetition_penalty=RepetitionPenalty(num_tokens=64, repeat=1.5))
    s = Sampler(vocab, p)
    assert s.sample(lg) == 10
    s.accept(10, False)
    # 10 is now penalized: 5.0/1.5 = 3.33 < 4.9
    assert s.sample(lg) == 11


def test_presence_frequency_penalty(vocab):
    lg = np.zeros(64, np.float32)
    lg[20] = 1.0
    p = SamplerParams(temp=0.0,
                      repetition_penalty=RepetitionPenalty(num_tokens=64, repeat=1.0,
                                                           freq=0.6, present=0.6))
    s = Sampler(vocab, p)
    s.accept(20, False)
    # 1.0 - 0.6 - 0.6 = -0.2 < 0 → some other token (all zeros) wins
    assert s.sample(lg) != 20


def test_sampler_reset_clears_history(vocab):
    lg = np.zeros(64, np.float32)
    lg[10] = 5.0
    lg[11] = 3.0  # beats the penalized 5.0/2.0 = 2.5
    p = SamplerParams(temp=0.0,
                      repetition_penalty=RepetitionPenalty(num_tokens=64, repeat=2.0))
    s = Sampler(vocab, p)
    s.accept(10, False)
    assert s.sample(lg) == 11
    s.reset()
    assert s.sample(lg) == 10


def test_custom_sampler_sequence(vocab):
    lg = make_logits()
    p = SamplerParams(temp=0.0, sampler_sequence=[SamplingType.TEMPERATURE])
    s = Sampler(vocab, p)
    assert s.sample(lg) == int(np.argmax(lg))


def test_mirostat_v2_runs(vocab):
    lg = make_logits()
    s = Sampler(vocab, SamplerParams(temp=1.0, rng_seed=1, mirostat=Mirostat(ver=2)))
    toks = [s.sample(lg) for _ in range(10)]
    assert all(0 <= t < 64 for t in toks)
    s2 = Sampler(vocab, SamplerParams(temp=1.0, rng_seed=1, mirostat=Mirostat(ver=2)))
    assert [s2.sample(lg) for _ in range(10)] == toks


def test_mirostat_v1_runs(vocab):
    lg = make_logits()
    s = Sampler(vocab, SamplerParams(temp=1.0, rng_seed=1, mirostat=Mirostat(ver=1)))
    toks = [s.sample(lg) for _ in range(5)]
    assert all(0 <= t < 64 for t in toks)


def test_mirostat_unsupported_version(vocab):
    s = Sampler(vocab, SamplerParams(mirostat=Mirostat(ver=3)))
    with pytest.raises(ValueError, match="Unsupported mirostat version"):
        s.sample(make_logits())


def test_xtc_removes_top_tokens(vocab):
    lg = np.full(64, -10.0, np.float32)
    lg[5] = 5.0
    lg[6] = 5.0
    # xtc with probability 1: removes all but the last candidate above threshold
    p = SamplerParams(
        temp=0.0, top_k=0, top_p=1.0, min_p=0.0,
        xtc=XTC(probability=1.0, threshold=0.2),
        sampler_sequence=[SamplingType.XTC, SamplingType.TEMPERATURE],
    )
    s = Sampler(vocab, p)
    # both 5,6 are ~0.5 prob; XTC removes the first, greedy picks the survivor
    assert s.sample(lg) == 6


def test_typical_p(vocab):
    lg = make_logits()
    p = SamplerParams(temp=0.0, top_k=0, top_p=1.0, min_p=0.0, typical_p=0.5)
    s = Sampler(vocab, p)
    tok = s.sample(lg)
    assert 0 <= tok < 64


def test_temp_ext_dynamic(vocab):
    lg = make_logits()
    p = SamplerParams(temp=1.0, temp_range=0.5, temp_exp=1.0, rng_seed=11)
    s = Sampler(vocab, p)
    toks = [s.sample(lg) for _ in range(10)]
    s2 = Sampler(vocab, p)
    assert [s2.sample(lg) for _ in range(10)] == toks
