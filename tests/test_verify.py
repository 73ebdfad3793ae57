"""LogitComparer/MetricsAggregator unit tests, mirroring t-LogitComparer.cpp:
identical inputs score perfectly; diverging inputs are penalized."""

import math

import pytest

from blama_tpu.runtime.token_data import TokenData
from blama_tpu.runtime.verify import LogitComparer, MetricsAggregator


def tdv(pairs):
    return [TokenData(t, l) for t, l in pairs]


IDENTICAL = tdv([(5, 10.0), (7, 9.5), (2, 8.0), (9, 4.0), (1, 1.0)])


def test_identical_inputs_perfect_metrics():
    m = LogitComparer.compare(IDENTICAL, list(IDENTICAL))
    assert m.top1_match == 1.0
    assert m.distance == 0.0
    assert m.jsd == pytest.approx(0.0, abs=1e-12)
    agg = MetricsAggregator()
    assert agg.push_and_verify(m) == pytest.approx(1.0)


def test_top1_mismatch():
    other = tdv([(7, 10.0), (5, 9.5), (2, 8.0), (9, 4.0), (1, 1.0)])
    m = LogitComparer.compare(IDENTICAL, other)
    assert m.top1_match == 0.0


def test_distance_is_energy_based():
    # double the logits → energy ratio 4 → distance |1-4|/4 = 0.75
    doubled = tdv([(t.token, t.logit * 2) for t in IDENTICAL])
    m = LogitComparer.compare(IDENTICAL, doubled)
    assert m.distance == pytest.approx(0.75, rel=1e-6)


def test_jsd_disjoint_tokens():
    other = tdv([(100, 10.0), (101, 9.5), (102, 8.0), (103, 4.0), (104, 1.0)])
    m = LogitComparer.compare(IDENTICAL, other)
    # no token overlap → every KL term is skipped → jsd 0 (reference quirk:
    # intersection-only JSD, LogitComparer.cpp:82-104)
    assert m.jsd == 0.0


def test_logit_similarity_identical():
    assert LogitComparer.logit_similarity(IDENTICAL, list(IDENTICAL)) == pytest.approx(1.0)


def test_logit_similarity_degrades():
    noisy = tdv([(t.token, t.logit + 0.5) for t in IDENTICAL])
    sim = LogitComparer.logit_similarity(IDENTICAL, noisy)
    assert 0.5 < sim < 1.0


def test_logit_similarity_no_overlap():
    other = tdv([(100, 1.0)])
    assert LogitComparer.logit_similarity(IDENTICAL, other) == 0.0


def test_aggregator_running_mean():
    agg = MetricsAggregator()
    from blama_tpu.runtime.verify import ComparisonMetrics

    s1 = agg.push_and_verify(ComparisonMetrics(1.0, 0.0, 0.0))
    assert s1 == pytest.approx(1.0)
    s2 = agg.push_and_verify(ComparisonMetrics(0.0, 1.0, 1.0))
    # mean of 1.0 and 0.0
    assert s2 == pytest.approx(0.5)


def test_softmax_uses_first_entry_as_max():
    """The reference softmax subtracts data[0].logit (assumes sorted); verify
    we preserve that behavior exactly for unsorted input."""
    unsorted = tdv([(1, 1.0), (2, 10.0)])
    m = LogitComparer.compare(unsorted, list(unsorted))
    # still finite and zero-divergence for identical inputs
    assert math.isfinite(m.jsd)
    assert m.jsd == pytest.approx(0.0, abs=1e-12)
