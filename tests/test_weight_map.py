"""ExampleWeightMap — per-feature weight overrides (reference
utils/example_weight_map.py + StatsOptions.per_feature_weight_override):
overridden features compute every weighted statistic with their own weight
column, others with the global one, in the same single-scan passes."""

import numpy as np
import pandas as pd
import pytest

from data_validation_spark.stats.engine import compute_statistics
from data_validation_spark.stats.options import StatsOptions
from data_validation_spark.weights import ExampleWeightMap


def test_example_weight_map_resolution():
    m = ExampleWeightMap("w", {"y": "w2", "a.b": "w3"})
    assert m.get("x") == "w" and m.get("y") == "w2" and m.get("a.b") == "w3"
    assert m.all_weight_features() == frozenset({"w", "w2", "w3"})
    assert m.has_overrides
    g = ExampleWeightMap("w")
    assert g.get("anything") == "w" and not g.has_overrides
    none = ExampleWeightMap()
    assert none.get("x") is None


def test_override_requires_global_weight():
    opts = StatsOptions(per_feature_weight_override={"y": "w2"})
    with pytest.raises(ValueError, match="requires weight_column"):
        _ = opts.example_weight_map


@pytest.fixture(scope="module")
def weighted_pdf():
    rng = np.random.default_rng(11)
    n = 200
    pdf = pd.DataFrame(
        {
            "x": rng.normal(size=n).round(3),
            "y": rng.normal(loc=5.0, size=n).round(3),
            "cat": np.where(rng.random(n) < 0.3, "a", "b"),
            "w": rng.uniform(0.5, 2.0, size=n).round(3),
            "w2": rng.uniform(1.0, 10.0, size=n).round(3),
        }
    )
    # some missing values in y so weighted presence differs
    pdf.loc[:19, "y"] = None
    return pdf


def _wmean(v, w):
    m = v.notna()
    return float((v[m] * w[m]).sum() / w[m].sum())


def test_per_feature_weight_override_exact_mode(spark, weighted_pdf):
    pdf = weighted_pdf
    df = spark.createDataFrame(pdf)
    stats = compute_statistics(
        df,
        StatsOptions(
            weight_column="w",
            per_feature_weight_override={"y": "w2", "cat": "w2"},
            categorical_features={"cat"},
        ),
    )
    sl = stats.slices[0]
    # weight columns are not statistics columns
    assert "w" not in sl.features and "w2" not in sl.features

    # x uses the global weight; y uses the override
    assert sl.features["x"].numeric.weighted_mean == pytest.approx(
        _wmean(pdf.x, pdf.w), rel=1e-9
    )
    assert sl.features["y"].numeric.weighted_mean == pytest.approx(
        _wmean(pdf.y, pdf.w2), rel=1e-9
    )
    # dataset-level weighted_num_examples stays on the global weight
    assert sl.weighted_num_examples == pytest.approx(float(pdf.w.sum()), rel=1e-9)
    # overridden feature's weighted presence subtracts from ITS weight total
    y_nonmissing = float(pdf.w2[pdf.y.notna()].sum())
    assert sl.features["y"].common.weighted_num_non_missing == pytest.approx(
        y_nonmissing, rel=1e-9
    )
    assert sl.features["y"].common.weighted_num_missing == pytest.approx(
        float(pdf.w2.sum()) - y_nonmissing, rel=1e-9
    )
    # global-weight feature keeps the dataset-total subtraction
    assert sl.features["x"].common.weighted_num_missing == pytest.approx(0.0, abs=1e-9)

    # weighted top-k of the overridden categorical uses w2 sums
    st = sl.features["cat"].string
    expected = pdf.groupby("cat").w2.sum()
    got = dict(st.weighted_top_values)
    assert got["a"] == pytest.approx(expected["a"], rel=1e-9)
    assert got["b"] == pytest.approx(expected["b"], rel=1e-9)


def test_per_feature_weight_override_sketch_mode_agrees(spark, weighted_pdf):
    pdf = weighted_pdf
    df = spark.createDataFrame(pdf)
    opts = dict(
        weight_column="w",
        per_feature_weight_override={"y": "w2"},
        categorical_features={"cat"},
    )
    exact = compute_statistics(df, StatsOptions(**opts))
    sketch = compute_statistics(df, StatsOptions(use_sketches=True, **opts))
    for name in ("x", "y"):
        e = exact.slices[0].features[name].numeric
        s = sketch.slices[0].features[name].numeric
        assert s.weighted_mean == pytest.approx(e.weighted_mean, rel=1e-9)
        assert s.weighted_std_dev == pytest.approx(e.weighted_std_dev, rel=1e-6)
    # weighted median of the overridden feature ≈ the w2-weighted truth
    v = pdf.y.dropna().sort_values()
    w = pdf.w2[v.index]
    cum = w.cumsum() / w.sum()
    true_median = float(v[cum >= 0.5].iloc[0])
    for st in (exact, sketch):
        assert st.slices[0].features["y"].numeric.weighted_histograms
        med = st.slices[0].features["y"].numeric.weighted_median
        assert med == pytest.approx(true_median, abs=0.35)
