"""Drift metric tests — cases modeled on the reference's metrics_test.cc."""

import math

import pytest

from data_validation_spark.stats.result import Histogram, HistogramBucket
from data_validation_spark.validate.drift import (
    align_histograms,
    jensen_shannon_divergence_counts,
    jensen_shannon_divergence_histograms,
    linfty_distance,
    normalized_absolute_difference,
)


def H(buckets, num_nan=0, type_="STANDARD"):
    return Histogram(type_, [HistogramBucket(*b) for b in buckets], num_nan=num_nan)


def test_linfty():
    a = {"x": 3.0, "y": 1.0}  # normalized: .75/.25
    b = {"x": 1.0, "y": 1.0}  # normalized: .5/.5
    key, val = linfty_distance(a, b)
    assert val == pytest.approx(0.25)
    assert key in ("x", "y")


def test_linfty_disjoint_keys():
    _, val = linfty_distance({"x": 1.0}, {"y": 1.0})
    assert val == pytest.approx(1.0)


def test_normalized_absolute_difference():
    a = {"x": 3.0, "y": 1.0}
    b = {"x": 1.0, "y": 1.0}
    # combined total = 6; diffs: x: |3-1|/6=1/3, y: 0
    key, val = normalized_absolute_difference(a, b)
    assert key == "x"
    assert val == pytest.approx(1 / 3)


def test_jsd_counts_identical_zero():
    m = {"a": 5.0, "b": 5.0}
    assert jensen_shannon_divergence_counts(m, dict(m)) == pytest.approx(0.0)


def test_jsd_counts_disjoint_one():
    assert jensen_shannon_divergence_counts({"a": 3.0}, {"b": 7.0}) == pytest.approx(1.0)


def test_jsd_counts_hand_computed():
    m1 = {"a": 2.0, "b": 1.0}
    m2 = {"a": 1.0, "b": 1.0}
    pa, pb = 2 / 3, 1 / 3
    qa, qb = 1 / 2, 1 / 2
    ma, mb = (pa + qa) / 2, (pb + qb) / 2
    expected = (
        pa * math.log2(pa / ma)
        + pb * math.log2(pb / mb)
        + qa * math.log2(qa / ma)
        + qb * math.log2(qb / mb)
    ) / 2
    assert jensen_shannon_divergence_counts(m1, m2) == pytest.approx(expected)


def test_jsd_histograms_identical_zero():
    h = H([(0, 1, 10), (1, 2, 20)])
    assert jensen_shannon_divergence_histograms(h, H([(0, 1, 10), (1, 2, 20)])) == pytest.approx(
        0.0
    )


def test_jsd_histograms_disjoint_one():
    h1 = H([(0, 1, 10)])
    h2 = H([(5, 6, 10)])
    assert jensen_shannon_divergence_histograms(h1, h2) == pytest.approx(1.0)


def test_jsd_histograms_rebucketing():
    # h1 uniform on [0,2); h2 uniform on [1,3) — overlap [1,2) is half of each.
    h1 = H([(0, 2, 10)])
    h2 = H([(1, 3, 10)])
    # After alignment: bounds {0,1,2,3}; p=(.5,.5,0), q=(0,.5,.5)
    p, q = align_histograms(h1, h2)
    assert p == pytest.approx([5.0, 5.0, 0.0])
    assert q == pytest.approx([0.0, 5.0, 5.0])
    jsd = jensen_shannon_divergence_histograms(h1, h2)
    expected = 0.5  # half mass disjoint, half identical: .5*1 + .5*0
    assert jsd == pytest.approx(expected)


def test_align_point_mass_and_nan_and_inf():
    h1 = H([(float("-inf"), 0, 2), (1, 1, 3), (1, 2, 5)], num_nan=1)
    h2 = H([(1, 2, 5)])
    p, q = align_histograms(h1, h2)
    # finite buckets [1,2): p=5,q=5; point mass 1→(3,0); inf→(2,0); nan pair
    assert sum(p) == pytest.approx(2 + 3 + 5 + 1)
    assert sum(q) == pytest.approx(5)
    assert len(p) == len(q)


def test_jsd_mismatched_total_ranges():
    h1 = H([(0, 10, 100)])
    h2 = H([(0, 5, 50), (5, 10, 50)])
    assert jensen_shannon_divergence_histograms(h1, h2) == pytest.approx(0.0, abs=1e-12)


def test_linf_uses_weighted_counts_when_present():
    from data_validation_spark.stats.result import RankBucket, StringStats
    from data_validation_spark.validate.rules import _linf
    from tests.test_validate import make_feature

    def sf(counts, wcounts=None):
        st = StringStats(
            rank_histogram=[RankBucket(i + 1, i + 1, k, v) for i, (k, v) in enumerate(counts.items())]
        )
        if wcounts is not None:
            st.weighted_rank_histogram = [
                RankBucket(i + 1, i + 1, k, v) for i, (k, v) in enumerate(wcounts.items())
            ]
        return make_feature("f", type_="STRING", string=st)

    # unweighted counts identical, weighted differ → weighted drives the metric
    a = sf({"x": 5.0, "y": 5.0}, {"x": 9.0, "y": 1.0})
    b = sf({"x": 5.0, "y": 5.0}, {"x": 1.0, "y": 9.0})
    assert _linf(a, b) == pytest.approx(0.8)
    # one side unweighted → falls back to unweighted maps
    c = sf({"x": 5.0, "y": 5.0})
    assert _linf(a, c) == pytest.approx(0.0)
