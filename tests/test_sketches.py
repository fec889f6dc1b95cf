"""Sketch-layer tests — three-way accumulate/merge/compact parity per the
reference's harness pattern (tdv/utils/test_util.py:276-389): (a) one
accumulator per batch then merge, (b) merge then compact, (c) sequential adds
into one accumulator must all agree within tolerance.
"""

import numpy as np
import pytest

from data_validation_spark.stats.sketches.countmin import CountMinTopK
from data_validation_spark.stats.sketches.hll import HyperLogLog
from data_validation_spark.stats.sketches.tdigest import TDigest


# ------------------------------------------------------------------ t-digest
def test_tdigest_quantiles_uniform():
    rng = np.random.RandomState(0)
    data = rng.uniform(0, 100, 50_000)
    td = TDigest()
    td.add(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert td.quantile(q) == pytest.approx(np.quantile(data, q), abs=1.0)
    assert td.min == data.min() and td.max == data.max()


def test_tdigest_three_way_parity():
    rng = np.random.RandomState(1)
    batches = [rng.normal(50, 10, 5000) for _ in range(4)]
    all_data = np.concatenate(batches)

    # (a) one accumulator per batch, merged
    accs = []
    for b in batches:
        t = TDigest()
        t.add(b)
        accs.append(t)
    merged = accs[0]
    for t in accs[1:]:
        merged = merged.merge(t)
    # (b) merged + compacted again
    compacted = merged.merge(TDigest())
    # (c) sequential
    seq = TDigest()
    for b in batches:
        seq.add(b)

    for q in (0.1, 0.5, 0.9):
        truth = np.quantile(all_data, q)
        for sk in (merged, compacted, seq):
            assert sk.quantile(q) == pytest.approx(truth, abs=0.5)
    assert merged.count == pytest.approx(len(all_data))


def test_tdigest_skewed_and_point_mass():
    td = TDigest()
    td.add(np.array([5.0] * 10_000))  # pure point mass
    assert td.quantile(0.5) == pytest.approx(5.0)
    td2 = TDigest()
    td2.add(np.concatenate([np.zeros(9000), np.full(1000, 1000.0)]))
    assert td2.quantile(0.5) == pytest.approx(0.0, abs=1e-6)
    assert td2.quantile(0.95) == pytest.approx(1000.0, abs=5.0)


def test_tdigest_ignores_nonfinite():
    td = TDigest()
    td.add(np.array([1.0, np.nan, np.inf, -np.inf, 3.0]))
    assert td.count == 2
    assert td.quantile(0.5) == pytest.approx(2.0, abs=1.0)


# ------------------------------------------------------------------ count-min
def test_cms_topk_exactish():
    rng = np.random.RandomState(2)
    # zipf-ish: value v_i with count ~ 1000/i
    values, counts = [], []
    for i in range(1, 200):
        values.append(f"v{i:03d}")
        counts.append(max(1000 // i, 1))
    cms = CountMinTopK()
    order = rng.permutation(len(values))
    cms.add_counts([values[i] for i in order], np.array([counts[i] for i in order]))
    top = cms.top_k(5)
    assert [t[0] for t in top] == ["v001", "v002", "v003", "v004", "v005"]
    assert top[0][1] == pytest.approx(1000, rel=0.01)


def test_cms_merge_parity():
    a = CountMinTopK()
    b = CountMinTopK()
    a.add_counts(["x", "y"], np.array([100, 50]))
    b.add_counts(["x", "z"], np.array([30, 70]))
    m = a.merge(b)
    top = dict(m.top_k(10))
    assert top["x"] == pytest.approx(130, rel=0.02)
    assert top["z"] == pytest.approx(70, rel=0.02)
    assert m.total == pytest.approx(250)


def test_cms_tie_break_larger_value_first():
    cms = CountMinTopK()
    cms.add_counts(["a", "b", "c"], np.array([5, 5, 9]))
    top = cms.top_k(3)
    assert top[0][0] == "c"
    assert [t[0] for t in top[1:]] == ["b", "a"]  # tie → larger value first


# ------------------------------------------------------------------ HLL
def test_hll_estimate():
    hll = HyperLogLog()
    vals = [f"item{i}" for i in range(10_000)]
    hll.add(vals)
    assert hll.estimate() == pytest.approx(10_000, rel=0.03)


def test_hll_merge():
    a = HyperLogLog()
    b = HyperLogLog()
    a.add([f"a{i}" for i in range(5000)])
    b.add([f"a{i}" for i in range(2500, 7500)])
    m = a.merge(b)
    assert m.estimate() == pytest.approx(7500, rel=0.03)


def test_hll_small_range():
    hll = HyperLogLog()
    hll.add(["x", "y", "z", "x"])
    assert hll.estimate() == 3


# ----------------------------------------------------------- engine parity
def test_sketch_mode_vs_exact(spark):
    rows = [(float(i % 100), f"k{i % 7}") for i in range(10_000)]
    df = spark.createDataFrame(rows, "x double, s string")
    from data_validation_spark.stats.engine import compute_statistics
    from data_validation_spark.stats.options import StatsOptions

    exact = compute_statistics(df, StatsOptions(use_sketches=False))
    sketch = compute_statistics(df, StatsOptions(use_sketches=True))

    ex = exact.default_slice().feature("x").numeric
    sx = sketch.default_slice().feature("x").numeric
    assert sx.median == pytest.approx(ex.median, abs=2.0)
    assert sx.mean == pytest.approx(ex.mean, rel=1e-6)
    assert sx.min == ex.min and sx.max == ex.max

    es = exact.default_slice().feature("s").string
    ss = sketch.default_slice().feature("s").string
    assert ss.unique == es.unique == 7
    assert dict(ss.top_values) == pytest.approx(dict(es.top_values), rel=0.01)
    # histograms exist in sketch mode too
    assert sx.histogram("STANDARD") is not None
    assert sx.histogram("STANDARD").total_count() == pytest.approx(10_000, rel=0.01)


# ------------------------------------------------- weighted quantile sketch
def _np_weighted_quantile(x, w, q):
    order = np.argsort(x)
    xs, ws = x[order], w[order]
    cw = np.cumsum(ws)
    return float(xs[np.searchsorted(cw, q * cw[-1])])


def test_tdigest_weighted_three_way_parity():
    # Reference weighted_quantiles_summary parity
    # (basic_stats_generator.py:350,387,470-472): the weighted digest must be
    # order-insensitive under add/merge/compact, and track the exact weighted
    # quantiles of the stream.
    rng = np.random.RandomState(3)
    batches = [
        (rng.normal(50, 10, 4000), rng.uniform(0.1, 5.0, 4000)) for _ in range(4)
    ]
    all_x = np.concatenate([b[0] for b in batches])
    all_w = np.concatenate([b[1] for b in batches])

    accs = []
    for x, w in batches:
        t = TDigest()
        t.add(x, w)
        accs.append(t)
    merged = accs[0]
    for t in accs[1:]:
        merged = merged.merge(t)
    compacted = merged.merge(TDigest())
    seq = TDigest()
    for x, w in batches:
        seq.add(x, w)

    for q in (0.1, 0.5, 0.9):
        truth = _np_weighted_quantile(all_x, all_w, q)
        for sk in (merged, compacted, seq):
            assert sk.quantile(q) == pytest.approx(truth, abs=0.6)
    assert merged.count == pytest.approx(all_w.sum(), rel=1e-9)


def test_feature_accumulator_weighted_merge_parity():
    import pandas as pd

    from data_validation_spark.stats.options import StatsOptions
    from data_validation_spark.stats.sketches.runner import FeatureAccumulator

    opts = StatsOptions(weight_column="w")
    rng = np.random.RandomState(4)
    x = rng.uniform(0, 100, 9000)
    w = rng.uniform(0.5, 2.0, 9000)

    seq = FeatureAccumulator(opts)
    seq.add_numbers(x, w)

    parts = []
    for i in range(3):
        a = FeatureAccumulator(opts)
        a.add_numbers(x[i::3], w[i::3])
        parts.append(a)
    merged = parts[0].merge(parts[1]).merge(parts[2])
    merged.compact()

    truth = _np_weighted_quantile(x, w, 0.5)
    assert seq.wtd.quantile(0.5) == pytest.approx(truth, abs=0.8)
    assert merged.wtd.quantile(0.5) == pytest.approx(truth, abs=0.8)
    assert merged.wfcnt == pytest.approx(seq.wfcnt) == pytest.approx(w.sum())
    assert merged.wfsum == pytest.approx(seq.wfsum, rel=1e-12)


def test_weighted_sketch_quantiles_engine(spark):
    # End-to-end: weighted median / mean / histograms in sketch mode
    # (WeightedNumericStatistics parity, basic_stats_generator.py:830-877).
    from data_validation_spark.stats.engine import compute_statistics
    from data_validation_spark.stats.options import StatsOptions

    rng = np.random.RandomState(5)
    x = rng.normal(50, 10, 8000)
    w = rng.uniform(0.1, 5.0, 8000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, w)], "x double, w double"
    )
    stats = compute_statistics(df, StatsOptions(weight_column="w", use_sketches=True))
    n = stats.default_slice().feature("x").numeric

    assert n.weighted_median == pytest.approx(
        _np_weighted_quantile(x, w, 0.5), abs=0.5
    )
    assert n.weighted_mean == pytest.approx(float((x * w).sum() / w.sum()), rel=1e-9)
    # histogram pair [STANDARD, QUANTILES], masses sum to total weight
    types = [h.type for h in n.weighted_histograms]
    assert types == ["STANDARD", "QUANTILES"]
    for h in n.weighted_histograms:
        assert h.total_count() == pytest.approx(float(w.sum()), rel=0.01)
    # weighted median of a skewed weighting differs from unweighted median
    # when weights correlate with value
    w2 = (x > 50).astype(float) * 4 + 1.0
    df2 = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, w2)], "x double, w double"
    )
    s2 = compute_statistics(df2, StatsOptions(weight_column="w", use_sketches=True))
    n2 = s2.default_slice().feature("x").numeric
    assert n2.weighted_median > n2.median + 2.0


def test_fanout_merge_tier_activates_and_preserves_results(spark, monkeypatch):
    # Two-tier salted merge (the explicit hot-key fanout,
    # stats_impl.py:296-303 CombinePerKey-with-fanout analogue): force the
    # tier on by lowering the threshold below the input's partition count and
    # assert (a) it activated and (b) sketch results are unchanged vs the
    # single-tier path — merge must be associative across the salt split.
    from data_validation_spark.stats import sketches
    from data_validation_spark.stats.engine import compute_statistics
    from data_validation_spark.stats.options import StatsOptions
    from data_validation_spark.stats.sketches import runner

    rows = [(float(i % 100), f"k{i % 11}") for i in range(8000)]
    df = spark.createDataFrame(rows, "x double, s string").repartition(8)

    base = compute_statistics(df, StatsOptions(use_sketches=True))
    assert runner.run_sketch_pass.last_used_fanout is False

    monkeypatch.setattr(runner, "FANOUT_THRESHOLD", 2)
    fanned = compute_statistics(df, StatsOptions(use_sketches=True))
    assert runner.run_sketch_pass.last_used_fanout is True

    for stats in (base, fanned):
        n = stats.default_slice().feature("x").numeric
        s = stats.default_slice().feature("s").string
        assert n.min == 0.0 and n.max == 99.0
        assert n.mean == pytest.approx(49.5, abs=0.5)
        assert s.unique == 11
    assert fanned.default_slice().feature("x").numeric.median == pytest.approx(
        base.default_slice().feature("x").numeric.median, abs=1.0
    )
    assert dict(fanned.default_slice().feature("s").string.top_values) == (
        dict(base.default_slice().feature("s").string.top_values)
    )


def test_weighted_quantiles_exact_mode_matches_sketch_mode(spark):
    # Exact mode with a weight column must ALSO emit WeightedNumericStatistics
    # median/histograms (reference emits them whenever weights are configured,
    # regardless of generator flavor) — via the dedicated weighted-quantile
    # job, agreeing with sketch mode within digest tolerance.
    from data_validation_spark.stats.engine import compute_statistics
    from data_validation_spark.stats.options import StatsOptions

    rng = np.random.RandomState(11)
    x = rng.normal(100, 20, 6000)
    w = rng.uniform(0.5, 3.0, 6000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, w)], "x double, w double"
    )
    exact = compute_statistics(df, StatsOptions(weight_column="w", use_sketches=False))
    sketch = compute_statistics(df, StatsOptions(weight_column="w", use_sketches=True))
    ne = exact.default_slice().feature("x").numeric
    ns = sketch.default_slice().feature("x").numeric
    truth = _np_weighted_quantile(x, w, 0.5)
    assert ne.weighted_median == pytest.approx(truth, abs=1.0)
    assert ne.weighted_median == pytest.approx(ns.weighted_median, abs=1.0)
    assert [h.type for h in ne.weighted_histograms] == ["STANDARD", "QUANTILES"]
    for h in ne.weighted_histograms:
        assert h.total_count() == pytest.approx(float(w.sum()), rel=0.01)
    # unweighted quantities unaffected
    assert ne.median == pytest.approx(ns.median, abs=1.0)

    # no weight column → no weighted quantile job, no weighted stats
    plain = compute_statistics(df.select("x"), StatsOptions())
    assert plain.default_slice().feature("x").numeric.weighted_median is None
