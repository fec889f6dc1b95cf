"""Mixed continuous/categorical kNN MI — ports of the reference's
``mutual_information_util_test.py`` (tensorflow_data_validation/utils).

Sample sizes are reduced from the reference's 50k (the repo's neighbor
kernels are chunked brute-force, O(n^2) — sized for the per-partition
samples the partitioned harness feeds them); tolerances are widened
proportionally where the estimator's variance scales with 1/sqrt(n).
Closed-form expectations (entropies, analytic Gaussian MI) are unchanged.
"""

import numpy as np
import pytest

from data_validation_spark.stats import mi_mixed

_MI = mi_mixed.mutual_information
_AMI = mi_mixed.adjusted_mutual_information

METHODS = ["smaller_data", "larger_data"]


def _make_correlated_features(means, rho, n=10000):
    # mutual_information_util_test.py:26-42 at reduced n.
    np.random.seed(30)
    means = np.array(means)
    d = means.size
    cov = np.ones((d, d)) * rho
    cov[range(d), range(d)] = 1
    dat = np.random.multivariate_normal(means, cov, n)
    expected_mi = -0.5 * (
        np.log2(np.linalg.det(cov)) - np.log2(np.linalg.det(cov[:-1, :-1]))
    )
    return [dat[:, i] for i in range(d)], expected_mi


def test_ordinal_independent_features():
    np.random.seed(29)
    r0 = np.random.randn(8000)
    r1 = np.random.randn(8000)
    for method in METHODS:
        result = _MI([r0], [r1], [False], [False], estimate_method=method, seed=21)
        assert abs(result) < 0.03


def test_entropy_self_mi():
    # MI of a uniform 8-way categorical with itself == its entropy, 3 bits —
    # both the categorical and the ordinal treatment.
    np.random.seed(23)
    r = np.random.randint(0, 8, 8000)
    for method in METHODS:
        result = _MI([r], [r], [True], [True], estimate_method=method, seed=21)
        assert result == pytest.approx(3, abs=0.05)
        result = _MI([r], [r], [False], [False], estimate_method=method, seed=21)
        assert result == pytest.approx(3, abs=0.05)


def test_correlated_gaussians():
    rho = 0.4
    [f0, f1], expected = _make_correlated_features([10, 20], rho, n=10000)
    for method in METHODS:
        result = _MI([f0], [f1], [False], [False], estimate_method=method, seed=21)
        assert result == pytest.approx(expected, abs=0.03)

    rho = 0.9
    [f0, f1, f2, f3], expected = _make_correlated_features([1, 2, -3, 4], rho, n=6000)
    for method in METHODS:
        result = _MI(
            [f1, f2, f3], [f0], [False] * 3, [False], estimate_method=method, seed=21
        )
        assert result == pytest.approx(expected, abs=0.1)


def test_adding_independent_feature():
    np.random.seed(23)
    r = np.random.randint(0, 8, 8000)
    s = np.random.randint(0, 3, 8000) + r
    w = np.random.randn(8000)
    for method in METHODS:
        mi_rs = _MI([r], [s], [False], [False], estimate_method=method, seed=21)
        mi_rws = _MI([r, w], [s], [False] * 2, [False], estimate_method=method, seed=21)
        assert mi_rws == pytest.approx(mi_rs, abs=0.06)


def test_missing_values():
    np.random.seed(23)
    n = 4000
    fz = np.array([1.0] * n)
    fx = np.random.random(n)
    fa = np.array([1] * (n // 2) + [2] * (n // 2), dtype=float)
    fb = np.array([2.3] * (n // 2) + [None] * (n // 2))
    fc = np.array([0.0] * (n // 2) + [10.0] * (n // 2))
    for method in METHODS:
        assert abs(_MI([fz], [fa], [False], [False], seed=23, estimate_method=method)) < 2e-2
        # Degenerate two-point "ordinal" features converge slowly (the KSG
        # radius saturates inside the point clusters): ~0.95 at n=4k, ~0.99
        # only by the reference's n=50k. Widened to 6e-2 accordingly.
        assert abs(_MI([fc], [fa], [False], [False], seed=23, estimate_method=method) - 1) < 6e-2
        # A half-missing feature carries exactly the 1 bit of its missingness.
        assert abs(_MI([fb], [fa], [False], [False], seed=23, estimate_method=method) - 1) < 6e-2
        assert (
            abs(_MI([fc, fx], [fa], [False] * 2, [False], seed=23, estimate_method=method) - 1)
            < 2e-2
        )
        assert (
            abs(_MI([fb, fx], [fa], [False] * 2, [False], seed=23, estimate_method=method) - 1)
            < 2e-2
        )


def test_filter_feature():
    # Reference sizes (2000/category): the fg-vs-filter_feat ordinal pair is
    # two-point degenerate and only lands on the closed form at this n.
    np.random.seed(3)
    per = 2000
    fa = np.array(
        ["cat0"] * per + ["cat1"] * per + ["cat2"] * per + ["cat3"] * per
    )
    fg = np.array([1] * per + [2] * per + [3] * per + [4] * per)
    filter_feat = np.array([1] * (3 * per) + [None] * per)
    filter_arr = np.array([True] * (3 * per) + [False] * per)
    for method in METHODS:
        result = _MI(
            [fg], [fa], [True], [True],
            filter_feature=filter_arr, seed=20, estimate_method=method,
        )
        assert result == pytest.approx(np.log2(3), abs=2e-2)
        result = _MI(
            [fg], [fa], [False], [True],
            filter_feature=filter_arr, seed=20, estimate_method=method,
        )
        assert result == pytest.approx(np.log2(3), abs=2e-2)
        # Unfiltered MI with the filter feature itself: H(present) vs the
        # 3/4-1/4 missingness split plus the in-category half bit.
        result = _MI([fg], [filter_feat], [False], [False], seed=23, estimate_method=method)
        assert result == pytest.approx((3 / 4) * np.log2(4 / 3) + 0.5, abs=2e-2)
        result = _MI(
            [fg], [filter_feat], [False], [False],
            filter_feature=filter_arr, seed=23, estimate_method=method,
        )
        assert abs(result) < 2e-2


def test_weight_feature():
    np.random.seed(3)
    per = 1000
    fa = np.array(
        ["cat0"] * per + ["cat1"] * per + ["cat2"] * per + ["cat3"] * per
    )
    fg = np.array([1] * per + [2] * per + [3] * per + [4] * per)
    weight_feat = np.array([1] * per + [0.5] * per + [0.25] * per + [0] * per)
    for method in METHODS:
        result = _MI(
            [fg], [fa], [True], [True],
            weight_feature=weight_feat, seed=20, estimate_method=method,
        )
        assert result == pytest.approx(7 / 8, abs=2e-2)
        result = _MI(
            [fg], [weight_feat], [False], [False],
            weight_feature=weight_feat, seed=23, estimate_method=method,
        )
        assert result == pytest.approx(7 / 8, abs=2e-2)


def test_assertions():
    np.random.seed(23)
    fx = np.random.random(1000)
    fy = np.array([1.0] * 1000)
    with pytest.raises(AssertionError):
        _MI([], [fy], [False], [False])
    with pytest.raises(AssertionError):
        _MI([fx], [], [False], [False])
    with pytest.raises(AssertionError):
        _MI(fx, [fy], [False], [False])
    with pytest.raises(AssertionError):
        _MI([fx], [fy], [False] * 2, [False])
    with pytest.raises(AssertionError):
        _MI([fx], [fy], [False], [False], output_each="False")
    with pytest.raises(AssertionError):
        _MI([fx], [fy], [False], [False], k=2)
    with pytest.raises(AssertionError):
        _MI([fx], [fy], [False], [False], estimate_method="bogus")
    with pytest.raises(AssertionError):
        _MI([fx], [np.inf * fy], [False], [False])


def test_output_each_sanity():
    np.random.seed(23)
    fx = np.random.randn(1000)
    fy = np.array([1.0] * 1000)
    fz = np.array([True] * 700 + [False] * 300)
    for method in METHODS:
        result, each_mi = _MI(
            [fx], [fy], [False], [False],
            seed=3, output_each=True, estimate_method=method,
        )
        assert abs(result) < 1e-2
        assert len(each_mi) == 1000
        assert max(0, np.mean(each_mi)) < 1e-2

        result, each_mi = _MI(
            [fx], [fy], [False], [False],
            filter_feature=fz, seed=4, output_each=True, estimate_method=method,
        )
        assert abs(result) < 1e-2
        assert len(each_mi) == 700
        assert max(0, np.mean(each_mi)) < 1e-2


def test_output_each():
    np.random.seed(97)
    n = 4000
    fx = np.random.randint(0, 8, n)
    for method in METHODS:
        for cat0, cat1 in [(True, True), (False, True), (False, False)]:
            result, each_mi = _MI(
                [fx], [fx], [cat0], [cat1],
                output_each=True, estimate_method=method, seed=5,
            )
            assert result == pytest.approx(3, abs=0.06)
            assert len(each_mi) == n
            assert np.mean(each_mi) == pytest.approx(3, abs=0.06)
            # Per-sample attributions localize: category 0 holds 1/8 of the mass.
            assert np.sum(each_mi[fx == 0]) / n == pytest.approx(3.0 / 8, abs=2e-2)

    for method in METHODS:
        for cat0, cat1, cat2 in [(False, False, True), (False, True, True)]:
            result, each_mi = _MI(
                [fx, fx], [fx], [cat0, cat1], [cat2],
                output_each=True, estimate_method=method, seed=9,
            )
            assert result == pytest.approx(3, abs=0.05)
            assert len(each_mi) == n
            assert np.mean(each_mi) == pytest.approx(3, abs=0.05)
            assert np.sum(each_mi[fx == 0]) / n == pytest.approx(3.0 / 8, abs=2e-2)


def test_categorical():
    np.random.seed(3)
    per = 1000
    a = np.array(
        [b"cat0"] * per + [b"cat1"] * per + [b"cat2"] * per + [b"\xc5\x8cmura"] * per
    )
    b = np.random.randn(a.size)
    g = np.array([i // (a.size // 8) for i in range(a.size)])
    h = np.array([b"cat%d" % (i // (a.size // 16)) for i in range(a.size)])
    for method in METHODS:
        # Independent gaussian vs the 4 categories: ~0 bits.
        result = _MI([b], [a], [False], [True], k=6, estimate_method=method, seed=20)
        assert abs(result) < 3e-2
        # A 16-level categorical determined by an 8-level ordinal ramp: 3 bits
        # (h refines g; knowing g gives 8 of h's 16 levels → log2(8)).
        result = _MI([g], [h], [False], [True], k=6, estimate_method=method, seed=20)
        assert result == pytest.approx(3, abs=0.05)


def test_categorical_ordinal():
    # The reference's testCategoricalOrdinal (mutual_information_util_test.py:380)
    # is accidentally nested inside testCategorical and never runs; ported here
    # as a live test. I(A;B) = H(B) - H(B|A) = -3/4*log2(3/4).
    np.random.seed(3)
    a = np.array([i % 2 for i in range(1000)])
    b = np.array([np.random.random() * (1.0 + i % 2) for i in range(1000)])
    filt = np.array([bool(i % 2) for i in range(1000)])
    for method in METHODS:
        assert _MI(
            [a], [b], [True], [False], estimate_method=method, seed=20
        ) == pytest.approx(-0.75 * np.log2(0.75), abs=2e-2)
        assert (
            _MI(
                [a], [b], [True], [False],
                estimate_method=method, seed=20, filter_feature=filt,
            )
            == 0.0
        )


def test_adjusted_mutual_information():
    np.random.seed(11)
    f0 = np.random.randint(0, 10000, 10000)
    label = np.array([0, 1] * 5000)
    result = _MI([f0], [label], [True], [True], seed=11)
    adjusted = _AMI([f0], [label], [True], [True], seed=11)
    # A near-unique categorical spuriously "explains" ~0.625 bits of the
    # label; the shuffled baseline cancels it.
    assert result == pytest.approx(0.625, abs=2e-2)
    assert adjusted == pytest.approx(0.0, abs=2e-2)


# ------------------------------------------------------------- helpers
def test_merge_categorical():
    actual = mi_mixed._merge_categorical(
        [
            np.array(["a", "b", "c"]),
            np.array(["1", "2", "3"]),
            np.array(["alpha", "beta", "gamma"]),
        ]
    )
    assert np.array_equal(
        np.array([b"a:1:alpha", b"b:2:beta", b"c:3:gamma"]), actual
    )


def test_entropy_discrete():
    discrete_f = np.array(["foo", "bar", "baz", "foo"])
    entropy, each = mi_mixed._entropy_discrete(
        discrete_f, np.ones_like(discrete_f, dtype=float)
    )
    expected_entropy = -(np.log2(0.5) * 0.5 + np.log2(0.25) * 0.25 * 2)
    expected_each = np.array(
        [-np.log2(0.5), -np.log2(0.25), -np.log2(0.25), -np.log2(0.5)]
    )
    assert np.allclose(expected_entropy, entropy, atol=1e-5)
    assert np.allclose(expected_each, each, atol=1e-5)


def test_replace_none_categorical():
    arr = np.array([1.0, 2.0, np.nan])
    expected = np.array([1.0, 2.0, 2 * 2.0 - 1.0 + mi_mixed._NONE_NUM])
    assert np.array_equal(expected, mi_mixed._replace_none_categorical(arr))
    all_nan = np.array([np.nan, np.nan])
    assert np.array_equal(
        np.full(2, mi_mixed._NONE_NUM), mi_mixed._replace_none_categorical(all_nan)
    )


def test_unit_variance_scale():
    arr = np.array([1.0, 2.0, np.nan])
    actual = mi_mixed._unit_variance_scale(arr)
    stdev = np.std([1.0, 2.0], ddof=1)
    assert np.allclose(
        np.array([(1.0 - 1.5) / stdev, (2 - 1.5) / stdev]),
        actual[~np.isnan(actual)],
        atol=1e-5,
    )
    assert np.isnan(actual[2])


def test_unit_variance_scale_uniform():
    arr = np.array([1.0, 1.0, np.nan])
    actual = mi_mixed._unit_variance_scale(arr)
    assert np.allclose([0.0, 0.0], actual[~np.isnan(actual)], atol=1e-5)
    assert np.isnan(actual[2])
    with pytest.raises(ValueError):
        mi_mixed._unit_variance_scale(np.array([np.nan, np.nan]))


def test_fill_missing_values():
    feat = np.array([1.0, 2.0, None])
    actual = mi_mixed._fill_missing_values(feat, False)
    np.testing.assert_equal(actual, np.array([1.0, 2.0, np.nan]))

    feat = np.array([b"a", b"b", None])
    actual = mi_mixed._fill_missing_values(feat, True)
    assert [
        i for i, v in enumerate(actual) if isinstance(v, float) and np.isnan(v)
    ] == [2]
    assert [v for v in actual if not isinstance(v, float)] == [b"a", b"b"]


def test_discrete_labels_appearing_exactly_once():
    feat0 = np.arange(10)
    feat1 = np.arange(10, 20).astype(int)
    with pytest.raises(ValueError, match=".*tuples.*discrete features.*are all unique.*"):
        mi_mixed._mi_for_arrays([feat0], [], [], [feat1], np.ones_like(feat1, dtype=float))


# --------------------------------------------------------- Spark wrapper
def test_estimated_mixed_mi_spark(spark):
    import pandas as pd

    rng = np.random.RandomState(7)
    n = 6000
    x = rng.randn(n)
    cat = np.where(x > 0, "pos", "neg")  # fully determined by sign(x): ~1 bit
    noise = rng.randn(n)
    pdf = pd.DataFrame({"x": x, "cat": cat, "noise": noise})
    df = spark.createDataFrame(pdf)

    related = mi_mixed.estimated_mixed_mi(
        df, ["x"], ["cat"], [False], [True], num_partitions=4
    )
    unrelated = mi_mixed.estimated_mixed_mi(
        df, ["noise"], ["cat"], [False], [True], num_partitions=4
    )
    assert set(related) >= {"min", "max", "mean", "median", "std", "num_partitions"}
    assert related["num_partitions"] == 4
    # sign(x) carries ~1 bit about cat; noise carries ~0.
    assert related["mean"] > 0.8
    assert unrelated["mean"] < 0.1

    adj = mi_mixed.estimated_mixed_mi(
        df, ["noise"], ["cat"], [False], [True], num_partitions=4, adjusted=True
    )
    assert adj["mean"] < 0.05
