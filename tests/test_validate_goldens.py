"""Table-driven goldens ported from the reference's validation_api_test.py
(file: tensorflow_data_validation/api/validation_api_test.py, 3597 lines).

Each test mirrors one reference case: same schema, same hand-built statistics,
and asserts the same anomaly set — reason types, severities, roll-up behavior
(MULTIPLE_REASONS), drift_skew_info measurements, and (where our wording is
reference-parity) the exact description strings. Reference line numbers are
cited per case.
"""

from collections import Counter

import pytest

from data_validation_spark.anomalies import AnomalyType as AT
from data_validation_spark.anomalies import Severity
from data_validation_spark.schema import (
    DistributionConstraints,
    DriftComparator,
    FeatureSpec,
    FeatureType,
    Presence,
    Schema,
    SkewComparator,
    SparseFeature,
    StringDomain,
    ValueCount,
    WeightedFeature,
)
from data_validation_spark.stats.result import (
    CommonStats,
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
    RankBucket,
    StringStats,
)
from data_validation_spark.validate.rules import (
    validate_corresponding_slices,
    validate_statistics,
)


# --------------------------------------------------------------- helpers ----

def string_feature(name, counts, num_missing=0, num_non_missing=None, unique=None):
    """FeatureStats with a rank histogram, mirroring the string_stats blocks
    the reference goldens parse from text protos."""
    fs = FeatureStats(name=name, type="STRING")
    if num_non_missing is None:
        num_non_missing = int(sum(counts.values()))
    fs.common = CommonStats(
        num_non_missing=num_non_missing,
        num_missing=num_missing,
        min_num_values=1 if num_non_missing else 0,
        max_num_values=1 if num_non_missing else 0,
        tot_num_values=num_non_missing,
        avg_num_values=1.0 if num_non_missing else 0.0,
    )
    fs.string = StringStats(
        unique=unique if unique is not None else len(counts),
        rank_histogram=[
            RankBucket(i + 1, i + 1, k, float(v))
            for i, (k, v) in enumerate(sorted(counts.items(), key=lambda kv: -kv[1]))
        ],
    )
    return fs


def stats_of(features, num_examples=10, slice_key="All Examples"):
    ds = DatasetStats(num_examples=num_examples, slice_key=slice_key)
    for f in features:
        ds.features[f.name] = f
    return DatasetStatsList([ds])


def custom_feature(name, custom):
    fs = FeatureStats(name=name, type="STRING")
    fs.common = CommonStats(num_non_missing=10)
    fs.custom = custom
    return fs


def anomaly_map(result):
    """feature → (set of reason types, max severity) — the shape the
    reference's _assert_equal_anomalies compares."""
    out = {}
    for feat, info in result.feature_anomaly_info().items():
        out[feat] = (
            {r["type"] for r in info["reasons"]},
            info["severity"],
        )
    return out


def sliced_statistics(values_slice1, values_slice2):
    """Mirror of _construct_sliced_statistics (validation_api_test.py:3438):
    named slices slice1/slice2 (slice2 only when non-empty) plus the overall
    default slice, each carrying string stats for feature 'foo'."""
    datasets = []
    for key, values in (
        ("slice1", values_slice1),
        ("slice2", values_slice2),
        ("All Examples", values_slice1 + values_slice2),
    ):
        if not values:
            continue
        ds = DatasetStats(num_examples=len(values), slice_key=key)
        ds.features["foo"] = string_feature("foo", dict(Counter(values)))
        datasets.append(ds)
    return DatasetStatsList(datasets)


def slices_schema():
    """Mirror of _test_schema (validation_api_test.py:3467)."""
    return Schema(
        feature=[
            FeatureSpec(
                name="foo",
                type=FeatureType.BYTES,
                string_domain=StringDomain(
                    name="feature_foo", value=["1", "2", "3", "4"]
                ),
                distribution_constraints=DistributionConstraints(min_domain_mass=0.5),
                presence=Presence(min_fraction=1.0),
            )
        ]
    )


# ------------------------------------------------------ single-stats cases --

def test_golden_validate_stats():
    """validation_api_test.py:1159 test_validate_stats — unexpected enum value
    D on annotated_enum; the DEPRECATED feature raises nothing even though its
    stats are absent."""
    schema = Schema(
        string_domain=[StringDomain(name="MyAloneEnum", value=["A", "B", "C"])],
        feature=[
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.BYTES,
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_count=1),
                domain="MyAloneEnum",
            ),
            FeatureSpec(
                name="ignore_this",
                deprecated=True,
                value_count=ValueCount(min=1),
                presence=Presence(min_count=1),
                type=FeatureType.BYTES,
            ),
        ],
    )
    stats = stats_of(
        [string_feature("annotated_enum", {"D": 1}, num_missing=3, num_non_missing=7, unique=3)]
    )
    result = validate_statistics(stats, schema)
    assert anomaly_map(result) == {
        "annotated_enum": ({AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES}, Severity.ERROR)
    }


def test_golden_weighted_feature_multiple_reasons():
    """validation_api_test.py:1244 test_validate_stats_weighted_feature —
    missing_weight=1, missing_value=2, length diff [3,4] → three reasons on
    one feature, rolled up to 'Multiple errors'."""
    schema = Schema(
        feature=[FeatureSpec(name="value"), FeatureSpec(name="weight")],
        weighted_feature=[
            WeightedFeature(name="weighted_feature", feature="value", weight_feature="weight")
        ],
    )
    stats = stats_of(
        [
            custom_feature(
                "weighted_feature",
                {
                    "weighted_feature_stats": {
                        "missing_weight": 1.0,
                        "missing_value": 2.0,
                        "min_weight_length_diff": 3.0,
                        "max_weight_length_diff": 4.0,
                    }
                },
            )
        ]
    )
    result = validate_statistics(stats, schema)
    amap = anomaly_map(result)
    # 'value'/'weight' specs are satisfied (no stats → not required); only the
    # logical weighted feature reports, with all three reference reasons.
    assert amap == {
        "weighted_feature": (
            {
                AT.WEIGHTED_FEATURE_MISSING_WEIGHT,
                AT.WEIGHTED_FEATURE_MISSING_VALUE,
                AT.WEIGHTED_FEATURE_LENGTH_MISMATCH,
            },
            Severity.ERROR,
        )
    }
    info = result.feature_anomaly_info()["weighted_feature"]
    assert info["short_description"] == "Multiple errors"


def test_golden_weighted_feature_name_collision():
    """validation_api_test.py:1325 — weighted feature colliding with a regular
    feature reports ONLY the collision (per-feature checks are skipped)."""
    schema = Schema(
        feature=[
            FeatureSpec(name="value"),
            FeatureSpec(name="weight"),
            FeatureSpec(name="colliding_feature"),
        ],
        weighted_feature=[
            WeightedFeature(name="colliding_feature", feature="value", weight_feature="weight")
        ],
    )
    stats = stats_of(
        [
            custom_feature(
                "colliding_feature",
                {
                    "weighted_feature_stats": {
                        "missing_weight": 1.0,
                        "missing_value": 2.0,
                        "min_weight_length_diff": 3.0,
                        "max_weight_length_diff": 4.0,
                    }
                },
            )
        ]
    )
    result = validate_statistics(stats, schema)
    assert anomaly_map(result) == {
        "colliding_feature": ({AT.WEIGHTED_FEATURE_NAME_COLLISION}, Severity.ERROR)
    }


def test_golden_weighted_sparse_name_collision():
    """validation_api_test.py:1399 — weighted + sparse features sharing a name
    collapse to a single WEIGHTED_FEATURE_NAME_COLLISION (weighted wins, the
    sparse checks are suppressed)."""
    schema = Schema(
        feature=[
            FeatureSpec(name="value"),
            FeatureSpec(name="weight"),
            FeatureSpec(name="index"),
        ],
        weighted_feature=[
            WeightedFeature(name="colliding_feature", feature="value", weight_feature="weight")
        ],
        sparse_feature=[
            SparseFeature(name="colliding_feature", value_feature="value", index_feature="index")
        ],
    )
    stats = stats_of(
        [
            custom_feature(
                "colliding_feature",
                {
                    "weighted_feature_stats": {
                        "missing_weight": 1.0,
                        "missing_value": 2.0,
                        "min_weight_length_diff": 3.0,
                        "max_weight_length_diff": 4.0,
                    },
                    "sparse_feature_stats": {
                        "missing_index": 1.0,
                        "missing_value": 2.0,
                        "min_length_diff": 3.0,
                        "max_length_diff": 4.0,
                    },
                },
            )
        ]
    )
    result = validate_statistics(stats, schema)
    assert anomaly_map(result) == {
        "colliding_feature": ({AT.WEIGHTED_FEATURE_NAME_COLLISION}, Severity.ERROR)
    }


# ----------------------------------------------------------- drift / skew ---

def _drift_schema():
    """Schema block shared by the previous/serving golden cluster
    (validation_api_test.py:1568-1579)."""
    return Schema(
        string_domain=[StringDomain(name="annotated_enum", value=["a"])],
        feature=[
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.BYTES,
                domain="annotated_enum",
                drift_comparator=DriftComparator(infinity_norm_threshold=0.01),
            )
        ],
    )


_ANNOTATED_ENUM_LINF_DESC = (
    "The Linfty distance between current and previous is 0.25 (up to six "
    "significant digits), above the threshold 0.01. The feature value with "
    "maximum difference is: b"
)

_BAR_LINF_DESC = (
    "The Linfty distance between training and serving is 0.2 (up to six "
    "significant digits), above the threshold 0.1. The feature value with "
    "maximum difference is: a"
)


def _current_enum():
    return stats_of(
        [string_feature("annotated_enum", {"a": 1, "b": 1})], num_examples=2
    )


def _previous_enum():
    return stats_of(
        [string_feature("annotated_enum", {"a": 3, "b": 1})], num_examples=4
    )


def test_golden_previous_stats_drift():
    """validation_api_test.py:1530 test_validate_stats_with_previous_stats —
    the _annotated_enum_anomaly_info golden: ENUM_TYPE_UNEXPECTED_STRING_VALUES
    + COMPARATOR_L_INFTY_HIGH (L∞=0.25 > 0.01, max-diff value 'b'), plus a
    drift_skew_info measurement row."""
    result = validate_statistics(
        _current_enum(), _drift_schema(), previous_statistics=_previous_enum()
    )
    amap = anomaly_map(result)
    assert amap == {
        "annotated_enum": (
            {AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES, AT.COMPARATOR_L_INFTY_HIGH},
            Severity.ERROR,
        )
    }
    info = result.feature_anomaly_info()["annotated_enum"]
    assert info["short_description"] == "Multiple errors"
    linf = [r for r in info["reasons"] if r["type"] == AT.COMPARATOR_L_INFTY_HIGH][0]
    assert linf["description"] == _ANNOTATED_ENUM_LINF_DESC
    assert [
        (m.feature, m.metric, m.value, m.threshold) for m in result.drift_skew_info
    ] == [("annotated_enum", "L_INFTY", pytest.approx(0.25), 0.01)]


_BAR_CURRENT = {"a": 1, "b": 2, "c": 7}
_BAR_SERVING = {"a": 3, "b": 1, "c": 6}


@pytest.mark.parametrize("has_skew", [False, True], ids=["no_skew", "with_skew"])
def test_golden_serving_stats_skew(has_skew):
    """validation_api_test.py:1613 test_validate_stats_with_serving_stats —
    L∞(bar current, serving)=0.2; threshold 0.1 triggers the _bar_anomaly_info
    golden, threshold 1.0 stays clean; the skew measurement is recorded in
    drift_skew_info either way."""
    threshold = 0.1 if has_skew else 1.0
    schema = Schema(
        feature=[
            FeatureSpec(
                name="bar",
                type=FeatureType.BYTES,
                skew_comparator=SkewComparator(infinity_norm_threshold=threshold),
            )
        ]
    )
    stats = stats_of([string_feature("bar", _BAR_CURRENT)])
    serving = stats_of([string_feature("bar", _BAR_SERVING)])
    result = validate_statistics(stats, schema, serving_statistics=serving)
    if has_skew:
        amap = anomaly_map(result)
        assert amap == {"bar": ({AT.COMPARATOR_L_INFTY_HIGH}, Severity.ERROR)}
        info = result.feature_anomaly_info()["bar"]
        assert info["reasons"][0]["description"] == _BAR_LINF_DESC
    else:
        assert result.passed and result.anomalies == []
    assert [
        (m.feature, m.metric, m.value, m.threshold) for m in result.drift_skew_info
    ] == [("bar", "L_INFTY", pytest.approx(0.2), threshold)]


def test_golden_environment():
    """validation_api_test.py:1701 test_validate_stats_with_environment — the
    label feature (not_in_environment: SERVING) is missing from the data:
    SCHEMA_MISSING_COLUMN in TRAINING, clean in SERVING."""
    schema = Schema(
        default_environment=["TRAINING", "SERVING"],
        feature=[
            FeatureSpec(
                name="label",
                not_in_environment=["SERVING"],
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_count=1),
                type=FeatureType.BYTES,
            ),
            FeatureSpec(
                name="feature",
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_count=1),
                type=FeatureType.BYTES,
            ),
        ],
    )
    stats = stats_of(
        [string_feature("feature", {"x": 1000}, unique=3)], num_examples=1000
    )
    training = validate_statistics(stats, schema, environment="TRAINING")
    assert anomaly_map(training) == {
        "label": ({AT.SCHEMA_MISSING_COLUMN}, Severity.ERROR)
    }
    serving = validate_statistics(stats, schema, environment="SERVING")
    assert serving.passed and serving.anomalies == []


def _prev_serving_schema():
    return Schema(
        string_domain=[StringDomain(name="annotated_enum", value=["a"])],
        feature=[
            FeatureSpec(
                name="bar",
                type=FeatureType.BYTES,
                skew_comparator=SkewComparator(infinity_norm_threshold=0.1),
            ),
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.BYTES,
                domain="annotated_enum",
                drift_comparator=DriftComparator(infinity_norm_threshold=0.01),
            ),
        ],
    )


def _both_features_current():
    return stats_of(
        [
            string_feature("bar", _BAR_CURRENT),
            string_feature("annotated_enum", {"a": 1, "b": 1}),
        ]
    )


def _both_features_control():
    # previous/serving/previous-version all share this shape in the reference
    return stats_of(
        [
            string_feature("annotated_enum", {"a": 3, "b": 1}),
            string_feature("bar", _BAR_SERVING),
        ]
    )


def _assert_bar_and_enum_goldens(result):
    amap = anomaly_map(result)
    assert amap == {
        "bar": ({AT.COMPARATOR_L_INFTY_HIGH}, Severity.ERROR),
        "annotated_enum": (
            {AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES, AT.COMPARATOR_L_INFTY_HIGH},
            Severity.ERROR,
        ),
    }
    info = result.feature_anomaly_info()
    assert info["bar"]["reasons"][0]["description"] == _BAR_LINF_DESC
    enum_linf = [
        r
        for r in info["annotated_enum"]["reasons"]
        if r["type"] == AT.COMPARATOR_L_INFTY_HIGH
    ][0]
    assert enum_linf["description"] == _ANNOTATED_ENUM_LINF_DESC
    measurements = {
        (m.feature, m.metric): (m.value, m.threshold) for m in result.drift_skew_info
    }
    assert measurements[("bar", "L_INFTY")] == (pytest.approx(0.2), 0.1)
    assert measurements[("annotated_enum", "L_INFTY")] == (pytest.approx(0.25), 0.01)


def test_golden_previous_and_serving():
    """validation_api_test.py:1773 — bar skew (serving) + annotated_enum drift
    (previous) fire together, each against its own control set, and both
    measurements land in drift_skew_info."""
    result = validate_statistics(
        _both_features_current(),
        _prev_serving_schema(),
        previous_statistics=_both_features_control(),
        serving_statistics=_both_features_control(),
    )
    _assert_bar_and_enum_goldens(result)


def test_golden_previous_and_serving_with_default_slices():
    """validation_api_test.py:1950 — every input carries extra named slices;
    validation compares default slice to default slice only, so the extra
    slices (annotated_enum_a/_b) change nothing."""
    current = _current_enum()

    prev = _previous_enum()
    extra_prev = DatasetStats(num_examples=1, slice_key="annotated_enum_b")
    extra_prev.features["annotated_enum"] = string_feature("annotated_enum", {"b": 1})
    prev.slices.append(extra_prev)

    serving = _previous_enum()
    extra_serv = DatasetStats(num_examples=3, slice_key="annotated_enum_a")
    extra_serv.features["annotated_enum"] = string_feature("annotated_enum", {"a": 3})
    serving.slices.append(extra_serv)

    result = validate_statistics(
        current,
        _drift_schema(),
        previous_statistics=prev,
        serving_statistics=serving,
    )
    amap = anomaly_map(result)
    assert amap == {
        "annotated_enum": (
            {AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES, AT.COMPARATOR_L_INFTY_HIGH},
            Severity.ERROR,
        )
    }


def test_golden_previous_version_stats():
    """validation_api_test.py:2234
    test_validate_stats_internal_with_previous_version_stats — adding
    previous_version_statistics (no version comparator in the schema) leaves
    the span-drift + serving-skew goldens unchanged."""
    result = validate_statistics(
        _both_features_current(),
        _prev_serving_schema(),
        previous_statistics=_both_features_control(),
        serving_statistics=_both_features_control(),
        previous_version_statistics=_both_features_control(),
    )
    _assert_bar_and_enum_goldens(result)


def test_golden_validation_options_features_needed():
    """validation_api_test.py:2430
    test_validate_stats_internal_with_validation_options_set — empty schema,
    both bar and annotated_enum are new, but only bar is in features_needed;
    new_features_are_warnings downgrades it to WARNING."""
    result = validate_statistics(
        _both_features_current(),
        Schema(),
        features_needed={"bar"},
        new_features_are_warnings=True,
    )
    assert anomaly_map(result) == {
        "bar": ({AT.SCHEMA_NEW_COLUMN}, Severity.WARNING)
    }
    # WARNING-only results still pass.
    assert result.passed


# ------------------------------------------------- corresponding slices -----

def test_golden_slices_no_anomalies():
    """validation_api_test.py:3489 — all slice values inside the domain."""
    stats = sliced_statistics(["1", "2", "3", "4"], ["2", "2", "3"])
    result = validate_corresponding_slices(stats, slices_schema())
    assert result.passed and result.anomalies == []


def test_golden_slices_missing_in_previous_ok():
    """validation_api_test.py:3497 — a slice present now but absent from the
    previous statistics is NOT an error."""
    current = sliced_statistics(["1", "2"], ["3", "4"])
    previous = sliced_statistics(["1", "2", "3", "4"], [])
    result = validate_corresponding_slices(
        current, slices_schema(), previous_statistics=previous
    )
    assert result.passed and result.anomalies == []


def test_golden_slices_missing_in_current_error():
    """validation_api_test.py:3507 — a slice that existed before but vanished
    from the current statistics reports SCHEMA_MISSING_COLUMN on the
    slice-qualified feature name."""
    current = sliced_statistics(["1", "2", "3", "4"], [])
    previous = sliced_statistics(["1", "2"], ["3", "4"])
    result = validate_corresponding_slices(
        current, slices_schema(), previous_statistics=previous
    )
    assert anomaly_map(result) == {
        "slice(slice2)::foo": ({AT.SCHEMA_MISSING_COLUMN}, Severity.ERROR)
    }


def test_golden_slices_anomaly_in_one_slice():
    """validation_api_test.py:3537 — slice2 = ['5'] (100% off-domain) reports
    unexpected string values on slice(slice2)::foo only; the overall slice
    stays under the 0.5 min_domain_mass allowance."""
    stats = sliced_statistics(["1", "2", "3", "4"], ["5"])
    result = validate_corresponding_slices(stats, slices_schema())
    assert anomaly_map(result) == {
        "slice(slice2)::foo": ({AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES}, Severity.ERROR)
    }


def test_golden_slices_distributional_anomaly():
    """validation_api_test.py:3563 — drift threshold 0.3: slice2 moved from
    {1,2} to {3,4} (L∞=0.5 → error, reference max-diff value '4'); slice1 and
    the overall slice stay under threshold."""
    current = sliced_statistics(["1", "2"], ["3", "4"])
    previous = sliced_statistics(["1", "2"], ["1", "2"])
    schema = slices_schema()
    schema.feature[0].drift_comparator = DriftComparator(infinity_norm_threshold=0.3)
    result = validate_corresponding_slices(
        current, schema, previous_statistics=previous
    )
    assert anomaly_map(result) == {
        "slice(slice2)::foo": ({AT.COMPARATOR_L_INFTY_HIGH}, Severity.ERROR)
    }
    desc = result.anomalies[0].description
    assert (
        "The Linfty distance between current and previous is 0.5 (up to six "
        "significant digits), above the threshold 0.3. The feature value with "
        "maximum difference is: 4"
    ) == desc
    # per-slice measurements: overall 0.25, slice1 0.0, slice2 0.5
    measurements = {
        m.feature: m.value for m in result.drift_skew_info if m.metric == "L_INFTY"
    }
    assert measurements["slice(slice2)::foo"] == pytest.approx(0.5)
    assert measurements["slice(slice1)::foo"] == pytest.approx(0.0)
    assert measurements["slice(All Examples)::foo"] == pytest.approx(0.25)


# --------------------------------------------------------------------------
# infer_schema golden cluster (validation_api_test.py:180-550)
# --------------------------------------------------------------------------
def _sf(name, non_missing, missing, unique=0, counts=None, min_vals=1, max_vals=1,
        pv=None):
    """String-feature stats builder mirroring the proto snippets."""
    from data_validation_spark.stats.result import PresenceAndValency

    rh = (
        [RankBucket(i, i, k, v) for i, (k, v) in enumerate(counts.items())]
        if counts
        else []
    )
    fs = FeatureStats(name=name, type="STRING")
    fs.common = CommonStats(
        num_non_missing=non_missing,
        num_missing=missing,
        min_num_values=min_vals,
        max_num_values=max_vals,
        tot_num_values=non_missing * max_vals,
    )
    if pv is not None:
        fs.common.presence_and_valency = [
            PresenceAndValency(
                num_non_missing=n, min_num_values=lo, max_num_values=hi,
                tot_num_values=n * max(hi, 1),
            )
            for (n, lo, hi) in pv
        ]
    fs.string = StringStats(unique=unique, rank_histogram=rh)
    return fs


def test_infer_schema_golden():
    """validation_api_test.py:180-226 (test_infer_schema): fully-present
    single-valent string, unique 3, NO rank histogram → BYTES with
    value_count(1,1), presence(min_count 1, min_fraction 1.0), no domain."""
    from data_validation_spark.validate.infer import infer_schema

    stats = DatasetStatsList(
        [DatasetStats(num_examples=7, features={"feature1": _sf("feature1", 7, 0, unique=3)})]
    )
    schema = infer_schema(stats, infer_feature_shape=False)
    f = schema.get_feature("feature1")
    assert f.type == FeatureType.BYTES
    assert f.value_count.min == 1 and f.value_count.max == 1
    assert f.presence.min_count == 1 and f.presence.min_fraction == 1.0
    assert f.string_domain is None and f.shape is None


def test_infer_schema_with_string_domain_golden():
    """validation_api_test.py:227-291: 3 missing of 6, unique 2 with rank
    histogram [a:2, b:1] → string domain [a, b]; presence has min_count only."""
    from data_validation_spark.validate.infer import infer_schema

    stats = DatasetStatsList(
        [
            DatasetStats(
                num_examples=6,
                features={
                    "feature1": _sf("feature1", 3, 3, unique=2, counts={"a": 2.0, "b": 1.0})
                },
            )
        ]
    )
    f = infer_schema(stats).get_feature("feature1")
    assert f.type == FeatureType.BYTES
    assert f.value_count.min == 1 and f.value_count.max == 1
    assert f.presence.min_count == 1 and not f.presence.min_fraction
    assert f.string_domain is not None
    assert list(f.string_domain.value) == ["a", "b"]


def test_infer_schema_without_string_domain_golden():
    """validation_api_test.py:292-352: unique 3 > max_string_domain_size 1 →
    no domain inferred."""
    from data_validation_spark.validate.infer import infer_schema

    stats = DatasetStatsList(
        [
            DatasetStats(
                num_examples=6,
                features={
                    "feature1": _sf("feature1", 3, 3, unique=3, counts={"a": 2.0, "b": 1.0})
                },
            )
        ]
    )
    f = infer_schema(stats, max_string_domain_size=1).get_feature("feature1")
    assert f.string_domain is None
    assert f.value_count.min == 1 and f.value_count.max == 1


def test_infer_schema_with_infer_shape_golden():
    """validation_api_test.py:353-549 (test_infer_schema_with_infer_shape):
    the six-feature shape/value-count matrix — shape only for fully-present
    constant positive valency (per nest level), value_count(s) otherwise,
    nothing when min valency is 0 (scalar) / empty entries (nested)."""
    from data_validation_spark.validate.infer import infer_schema

    features = {
        "feature1": _sf("feature1", 7, 0, unique=3),
        "feature2": _sf("feature2", 5, 2, unique=5),
        "feature3": _sf("feature3", 7, 0, unique=5, min_vals=0, max_vals=1),
        "nested_feature1": _sf(
            "nested_feature1", 7, 0, unique=3, pv=[(7, 1, 1), (7, 1, 1)]
        ),
        "nested_feature2": _sf(
            "nested_feature2", 5, 2, unique=5, pv=[(5, 1, 1), (5, 1, 1)]
        ),
        "nested_feature3": _sf(
            "nested_feature3", 7, 0, unique=5, min_vals=0, pv=[(7, 0, 1), (7, 0, 1)]
        ),
    }
    stats = DatasetStatsList([DatasetStats(num_examples=7, features=features)])
    schema = infer_schema(stats, infer_feature_shape=True)

    f1 = schema.get_feature("feature1")
    assert f1.shape is not None and f1.shape.dim == [1]
    assert f1.value_count is None
    assert f1.presence.min_fraction == 1.0

    f2 = schema.get_feature("feature2")
    assert f2.shape is None
    assert f2.value_count.min == 1 and f2.value_count.max == 1
    assert f2.presence.min_count == 1 and not f2.presence.min_fraction

    f3 = schema.get_feature("feature3")  # min valency 0 → no shape, no count
    assert f3.shape is None and f3.value_count is None
    assert f3.presence.min_fraction == 1.0

    n1 = schema.get_feature("nested_feature1")
    assert n1.shape is not None and n1.shape.dim == [1, 1]
    assert n1.value_counts is None

    n2 = schema.get_feature("nested_feature2")
    assert n2.shape is None
    assert [(vc.min, vc.max) for vc in n2.value_counts] == [(1, 1), (1, 1)]

    n3 = schema.get_feature("nested_feature3")
    assert n3.shape is None
    assert [(vc.min, vc.max) for vc in n3.value_counts] == [(None, None), (None, None)]


def test_infer_schema_never_present_feature():
    """feature_util.cc:513-529: num_present < 1 → presence.min_count 0 and
    nothing else inferred."""
    from data_validation_spark.validate.infer import infer_schema

    stats = DatasetStatsList(
        [DatasetStats(num_examples=5, features={"gone": _sf("gone", 0, 5)})]
    )
    f = infer_schema(stats).get_feature("gone")
    assert f.presence.min_count == 0 and not f.presence.min_fraction
    assert f.value_count is None and f.shape is None and f.string_domain is None


def test_update_schema_golden():
    """validation_api_test.py:852-939 (test_update_schema): stats show value D
    outside the shared string domain [A,B,C] → ENUM_TYPE_UNEXPECTED_STRING_VALUES;
    update_schema appends D; revalidation is clean."""
    from data_validation_spark.validate.infer import update_schema

    schema = Schema(
        feature=[
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.BYTES,
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_count=1),
                string_domain=StringDomain(name="MyAloneEnum", value=["A", "B", "C"]),
            )
        ]
    )
    fs = FeatureStats(name="annotated_enum", type="STRING")
    # the reference proto sets no tot_num_values → frequency renders as '?'
    fs.common = CommonStats(
        num_non_missing=7, num_missing=3, min_num_values=1, max_num_values=1,
    )
    fs.string = StringStats(
        unique=3, rank_histogram=[RankBucket(0, 0, "D", 1.0)]
    )
    stats = DatasetStatsList(
        [DatasetStats(num_examples=10, features={"annotated_enum": fs})]
    )

    result = validate_statistics(stats, schema)
    assert {a.type for a in result.anomalies} == {AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES}
    # exact reference description, trailing space included
    assert (
        result.anomalies[0].description
        == "Examples contain values missing from the schema: D (?). "
    )

    updated = update_schema(schema, stats)
    dom = updated.resolve_string_domain(updated.get_feature("annotated_enum"))
    assert list(dom.value) == ["A", "B", "C", "D"]
    assert validate_statistics(stats, updated).passed


def test_update_schema_remove_inferred_shape_golden():
    """validation_api_test.py:1078-1158 (test_update_schema_remove_inferred_shape):
    a shape inferred from fully-present stats must be dropped when updated
    against stats with a missing example, and never re-added."""
    from data_validation_spark.validate.infer import infer_schema, update_schema

    def _stats(non_missing, missing):
        fs = FeatureStats(name="f1", type="INT")
        fs.common = CommonStats(
            num_non_missing=non_missing, num_missing=missing,
            min_num_values=1, max_num_values=1, tot_num_values=non_missing,
        )
        from data_validation_spark.stats.result import NumericStats

        fs.numeric = NumericStats(min=0, max=1)
        return DatasetStatsList(
            [DatasetStats(num_examples=non_missing + missing, features={"f1": fs})]
        )

    stats1, stats2 = _stats(10000, 0), _stats(9999, 1)

    # Scenario 1: shape inferred from stats1, removed against stats2, not
    # re-added even when stats support it again.
    schema = infer_schema(stats1, infer_feature_shape=True)
    assert schema.feature[0].shape is not None
    updated = update_schema(schema, stats2)
    assert updated.feature[0].shape is None
    updated = update_schema(updated, stats1)
    assert updated.feature[0].shape is None

    # Scenario 2: no shape inferred from stats2; updating against stats1 must
    # not add one.
    schema = infer_schema(stats2, infer_feature_shape=True)
    assert schema.feature[0].shape is None
    updated = update_schema(schema, stats1)
    assert updated.feature[0].shape is None

    # Scenario 3: shape from stats1 survives an update against stats1 itself.
    schema = infer_schema(stats1, infer_feature_shape=True)
    updated = update_schema(schema, stats1)
    assert updated.feature[0].shape is not None


def test_enum_surface_frequencies_golden():
    """string_domain_test.cc:369-441 (SurfaceFrequenciesOfMissingValues):
    off-domain 'gamma' at 3/10 values renders '(~30%)'; at 0.05/124 it
    renders '(<1%)'."""
    schema = Schema(
        feature=[
            FeatureSpec(
                name="bar",
                type=FeatureType.BYTES,
                string_domain=StringDomain(name="MyEnum", value=["alpha", "beta"]),
            )
        ]
    )

    def _stats(tot, buckets):
        fs = FeatureStats(name="bar", type="STRING")
        fs.common = CommonStats(
            num_non_missing=10, num_missing=3, min_num_values=1, max_num_values=2,
            tot_num_values=tot,
        )
        fs.string = StringStats(
            unique=3,
            rank_histogram=[RankBucket(i, i, k, v) for i, (k, v) in enumerate(buckets)],
        )
        return DatasetStatsList([DatasetStats(num_examples=13, features={"bar": fs})])

    r = validate_statistics(_stats(10, [("alpha", 7.0), ("gamma", 3.0)]), schema)
    descs = [a.description for a in r.anomalies if a.type == AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES]
    assert descs and "gamma (~30%)" in descs[0]

    r2 = validate_statistics(_stats(124, [("alpha", 123.0), ("gamma", 0.05)]), schema)
    descs2 = [a.description for a in r2.anomalies if a.type == AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES]
    assert descs2 and "gamma (<1%)" in descs2[0]


def test_enum_invalid_utf8_short_circuits():
    """string_domain_util.cc:157-164: invalid UTF-8 emits its own reason with
    the reference wording and suppresses the off-domain check."""
    schema = Schema(
        feature=[
            FeatureSpec(
                name="bar",
                type=FeatureType.BYTES,
                string_domain=StringDomain(value=["alpha"]),
            )
        ]
    )
    fs = FeatureStats(name="bar", type="STRING")
    fs.common = CommonStats(num_non_missing=2, min_num_values=1, max_num_values=1,
                            tot_num_values=2)
    fs.string = StringStats(
        unique=2,
        invalid_utf8_count=1,
        rank_histogram=[RankBucket(0, 0, "offdomain", 2.0)],
    )
    stats = DatasetStatsList([DatasetStats(num_examples=2, features={"bar": fs})])
    r = validate_statistics(stats, schema)
    types_seen = {a.type for a in r.anomalies}
    assert AT.ENUM_TYPE_INVALID_UTF8 in types_seen
    assert AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES not in types_seen
    utf8 = [a for a in r.anomalies if a.type == AT.ENUM_TYPE_INVALID_UTF8][0]
    assert utf8.description == "Found strings that were not valid UTF8 strings."


def test_feature_statistics_validator_end_to_end_golden():
    """feature_statistics_validator_test.cc:85-173 (EndToEnd): exactly one
    anomaly — the enum 'D (?)' — while the stats-present-but-empty
    missing_column (no presence constraint) and the DEPRECATED required
    feature produce nothing."""
    schema = Schema(
        string_domain=[StringDomain(name="MyAloneEnum", value=["A", "B", "C"])],
        feature=[
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.BYTES,
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_count=1),
                domain="MyAloneEnum",
            ),
            FeatureSpec(name="missing_column", type=FeatureType.BYTES),
            FeatureSpec(
                name="ignore_this",
                type=FeatureType.BYTES,
                lifecycle_stage="DEPRECATED",
                value_count=ValueCount(min=1),
                presence=Presence(min_count=1),
            ),
        ],
    )
    enum_fs = FeatureStats(name="annotated_enum", type="STRING")
    enum_fs.common = CommonStats(
        num_missing=3, num_non_missing=4, min_num_values=1, max_num_values=1
    )
    enum_fs.string = StringStats(
        unique=3, rank_histogram=[RankBucket(0, 0, "D", 1.0)]
    )
    missing_fs = FeatureStats(name="missing_column", type="STRING")
    missing_fs.common = CommonStats(num_missing=1000)
    missing_fs.string = StringStats()
    stats = DatasetStatsList(
        [
            DatasetStats(
                num_examples=1000,
                features={"annotated_enum": enum_fs, "missing_column": missing_fs},
            )
        ]
    )
    result = validate_statistics(stats, schema)
    assert anomaly_map(result) == {
        "annotated_enum": ({AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES}, Severity.ERROR)
    }
    a = [x for x in result.anomalies if x.feature == "annotated_enum"][0]
    assert a.description == "Examples contain values missing from the schema: D (?). "
    assert a.short_description == "Unexpected string values"


def test_feature_statistics_validator_missing_column_golden():
    """feature_statistics_validator_test.cc:175-220 (MissingColumn): a
    required feature absent from the stats → SCHEMA_MISSING_COLUMN with the
    exact 'Column is completely missing' / 'Column dropped' strings."""
    schema = Schema(
        feature=[
            FeatureSpec(
                name="feature_name",
                type=FeatureType.BYTES,
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_count=1),
            )
        ]
    )
    stats = stats_of([string_feature("other", {"x": 3.0})], num_examples=1000)
    result = validate_statistics(stats, schema, features_needed={"other"})
    missing = [a for a in result.anomalies if a.feature == "feature_name"]
    assert len(missing) == 1
    assert missing[0].type == AT.SCHEMA_MISSING_COLUMN
    assert missing[0].description == "Column is completely missing"
    assert missing[0].short_description == "Column dropped"


def test_bool_domain_float_semantics_golden():
    """bool_domain_util.cc:213-280 (UpdateBoolDomain FLOAT branch): a float
    feature with values exactly in {0, 1} is a VALID bool; out-of-set
    extremes, NaN, and quantiles-histogram interior mass each produce the
    reference's exact "converting to float_domain" description."""
    from data_validation_spark.schema import BoolDomain
    from data_validation_spark.stats.result import Histogram, HistogramBucket, NumericStats

    def _bool_schema():
        return Schema(
            feature=[FeatureSpec(name="b", type=FeatureType.FLOAT, bool_domain=BoolDomain())]
        )

    def _float_stats(numeric):
        fs = FeatureStats(name="b", type="FLOAT")
        fs.common = CommonStats(num_non_missing=4, min_num_values=1, max_num_values=1,
                                tot_num_values=4)
        fs.numeric = numeric
        return DatasetStatsList([DatasetStats(num_examples=4, features={"b": fs})])

    # all-{0,1} floats: clean
    r = validate_statistics(_float_stats(NumericStats(min=0.0, max=1.0)), _bool_schema())
    assert AT.BOOL_TYPE_UNEXPECTED_FLOAT not in {a.type for a in r.anomalies}

    # out-of-set extreme
    r = validate_statistics(_float_stats(NumericStats(min=0.0, max=2.0)), _bool_schema())
    descs = [a.description for a in r.anomalies if a.type == AT.BOOL_TYPE_UNEXPECTED_FLOAT]
    assert descs == ["Floats (such as 2) not in {0, 1}: converting to float_domain."]

    # NaN
    r = validate_statistics(
        _float_stats(NumericStats(min=0.0, max=1.0, num_nan=1)), _bool_schema()
    )
    descs = [a.description for a in r.anomalies if a.type == AT.BOOL_TYPE_UNEXPECTED_FLOAT]
    assert descs == ["Floats (such as NaN) not in {0, 1}: converting to float_domain."]

    # interior mass via quantiles histogram
    n = NumericStats(min=0.0, max=1.0)
    n.histograms = [
        Histogram("QUANTILES", [HistogramBucket(0.25, 0.75, 2.0)])
    ]
    r = validate_statistics(_float_stats(n), _bool_schema())
    descs = [a.description for a in r.anomalies if a.type == AT.BOOL_TYPE_UNEXPECTED_FLOAT]
    assert descs == ["Float values falling between 0 and 1: converting to float_domain."]


def test_bool_domain_int_and_string_wording_golden():
    """bool_domain_util.cc:189-212, 283-303: exact int/string bool-domain
    descriptions."""
    from data_validation_spark.schema import BoolDomain
    from data_validation_spark.stats.result import NumericStats

    int_schema = Schema(
        feature=[FeatureSpec(name="b", type=FeatureType.INT, bool_domain=BoolDomain())]
    )
    fs = FeatureStats(name="b", type="INT")
    fs.common = CommonStats(num_non_missing=3, min_num_values=1, max_num_values=1,
                            tot_num_values=3)
    fs.numeric = NumericStats(min=0.0, max=5.0)
    stats = DatasetStatsList([DatasetStats(num_examples=3, features={"b": fs})])
    r = validate_statistics(stats, int_schema)
    descs = [a.description for a in r.anomalies if a.type == AT.BOOL_TYPE_BIG_INT]
    assert descs == ["Integers (such as 5) not in {0, 1}: converting to an integer."]

    str_schema = Schema(
        feature=[
            FeatureSpec(
                name="b",
                type=FeatureType.BYTES,
                bool_domain=BoolDomain(true_value="yes", false_value="no"),
            )
        ]
    )
    sfs = string_feature("b", {"yes": 2.0, "maybe": 1.0})
    r = validate_statistics(stats_of([sfs]), str_schema)
    descs = [a.description for a in r.anomalies if a.type == AT.BOOL_TYPE_UNEXPECTED_STRING]
    assert descs == ['Saw unexpected value "maybe" instead of {"no", "yes"}.']


# ------------------------- round-4 additions: comparator golden clusters ----

def _int_hist_feature(name, buckets, mn=None, mx=None, num_non_missing=1):
    """INT FeatureStats with a STANDARD histogram — the num_stats blocks of
    the reference's numeric drift goldens."""
    from data_validation_spark.stats.result import (
        Histogram,
        HistogramBucket,
        NumericStats,
    )

    fs = FeatureStats(name=name, type="INT")
    fs.common = CommonStats(
        num_non_missing=num_non_missing,
        num_missing=0,
        min_num_values=1,
        max_num_values=1,
        tot_num_values=num_non_missing,
        avg_num_values=1.0,
    )
    n = NumericStats(
        min=mn if mn is not None else buckets[0][0],
        max=mx if mx is not None else buckets[-1][1],
    )
    n.histograms = [
        Histogram("STANDARD", [HistogramBucket(lo, hi, c) for lo, hi, c in buckets])
    ]
    fs.numeric = n
    return fs


def test_golden_numeric_jsd_drift_with_int_domain():
    """feature_statistics_validator_test.cc:658-742
    UpdateDriftComparatorInSchemaNumericFeature — disjoint STANDARD histograms
    give JSD exactly 1; int_domain min 2 adds INT_TYPE_SMALL_INT; the roll-up
    is 'Multiple errors' with the reference's exact JSD description, and the
    measurement row carries value 1 / threshold 0.01."""
    from data_validation_spark.schema import IntDomain

    schema = Schema(
        feature=[
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.INT,
                int_domain=IntDomain(min=2, max=3),
                drift_comparator=DriftComparator(
                    jensen_shannon_divergence_threshold=0.01
                ),
            )
        ]
    )
    cur = stats_of(
        [_int_hist_feature("annotated_enum", [(1.0, 2.0, 1.0), (2.0, 3.0, 1.0)],
                           mn=1, mx=3)],
        num_examples=2,
    )
    prev = stats_of(
        [_int_hist_feature("annotated_enum", [(5.0, 6.0, 2.0), (6.0, 7.0, 2.0)])],
        num_examples=4,
    )
    result = validate_statistics(cur, schema, previous_statistics=prev)
    amap = anomaly_map(result)
    assert amap == {
        "annotated_enum": (
            {AT.INT_TYPE_SMALL_INT, AT.COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH},
            Severity.ERROR,
        )
    }
    info = result.feature_anomaly_info()["annotated_enum"]
    assert info["short_description"] == "Multiple errors"
    reasons = {r["type"]: r for r in info["reasons"]}
    assert reasons[AT.INT_TYPE_SMALL_INT]["description"] == (
        "Unexpectedly small value: 1."
    )
    assert reasons[AT.COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH]["description"] == (
        "The approximate Jensen-Shannon divergence between current and previous "
        "is 1 (up to six significant digits), above the threshold 0.01."
    )
    assert [
        (m.feature, m.metric, m.value, m.threshold) for m in result.drift_skew_info
    ] == [("annotated_enum", "JENSEN_SHANNON_DIVERGENCE", pytest.approx(1.0), 0.01)]


def test_golden_jsd_drift_within_threshold_still_measured():
    """feature_statistics_validator_test.cc:745-805
    UpdateDriftComparatorDistributionChangeWithinThreshold — identical
    histograms: JSD 0, threshold 0.5 → NO anomaly, but the drift measurement
    row (value 0, threshold 0.5) is still reported."""
    schema = Schema(
        feature=[
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.INT,
                drift_comparator=DriftComparator(
                    jensen_shannon_divergence_threshold=0.5
                ),
            )
        ]
    )
    hist = [(1.0, 2.0, 1.0), (2.0, 3.0, 1.0)]
    cur = stats_of([_int_hist_feature("annotated_enum", hist, mn=1, mx=3)],
                   num_examples=2)
    prev = stats_of([_int_hist_feature("annotated_enum", hist, mn=1, mx=3)],
                    num_examples=4)
    result = validate_statistics(cur, schema, previous_statistics=prev)
    assert result.passed and result.anomalies == []
    assert [
        (m.feature, m.metric, m.value, m.threshold) for m in result.drift_skew_info
    ] == [("annotated_enum", "JENSEN_SHANNON_DIVERGENCE", pytest.approx(0.0), 0.5)]


def test_golden_num_examples_span_and_version_comparators():
    """feature_statistics_validator_test.cc:808-875
    ValidateFeatureStatsWithNumExamplesComparators — num_examples 2 vs 4 in
    BOTH the previous span and the previous version with min_fraction 1.0:
    two COMPARATOR_LOW_NUM_EXAMPLES reasons roll up to 'Multiple errors' at
    ERROR, each with the reference's exact ratio description."""
    from data_validation_spark.schema import (
        DatasetConstraints,
        NumExamplesVersionComparator,
    )

    schema = Schema(
        dataset_constraints=DatasetConstraints(
            num_examples_drift_comparator=NumExamplesVersionComparator(
                min_fraction_threshold=1.0, max_fraction_threshold=1.0
            ),
            num_examples_version_comparator=NumExamplesVersionComparator(
                min_fraction_threshold=1.0, max_fraction_threshold=1.0
            ),
        )
    )
    cur = stats_of([], num_examples=2)
    prev = stats_of([], num_examples=4)
    prev_version = stats_of([], num_examples=4)
    result = validate_statistics(
        cur,
        schema,
        previous_statistics=prev,
        previous_version_statistics=prev_version,
    )
    info = result.feature_anomaly_info()[""]
    assert info["short_description"] == "Multiple errors"
    assert info["severity"] == Severity.ERROR
    descs = sorted(
        r["description"]
        for r in info["reasons"]
        if r["type"] == AT.COMPARATOR_LOW_NUM_EXAMPLES
    )
    assert descs == [
        "The ratio of num examples in the current dataset versus the previous "
        "span is 0.5 (up to six significant digits), which is below the "
        "threshold 1.",
        "The ratio of num examples in the current dataset versus the previous "
        "version is 0.5 (up to six significant digits), which is below the "
        "threshold 1.",
    ]
    assert len(info["reasons"]) == 2


def test_golden_find_skew_linf_and_jsd():
    """schema_test.cc:761-880 FindSkew — string-feature L∞ skew (0.2 > 0.1)
    and numeric-feature JSD skew (disjoint histograms → 1.0 > 0.1) fire
    together against serving stats, each recording its skew measurement."""
    schema = Schema(
        feature=[
            FeatureSpec(
                name="string_feature",
                type=FeatureType.BYTES,
                skew_comparator=SkewComparator(infinity_norm_threshold=0.1),
            ),
            FeatureSpec(
                name="numeric_feature",
                type=FeatureType.INT,
                skew_comparator=SkewComparator(
                    jensen_shannon_divergence_threshold=0.1
                ),
            ),
        ]
    )
    training = stats_of(
        [
            string_feature("string_feature", {"a": 1, "b": 2, "c": 7}),
            _int_hist_feature(
                "numeric_feature", [(1.0, 2.0, 1.0), (2.0, 3.0, 1.0)]
            ),
        ]
    )
    serving = stats_of(
        [
            string_feature("string_feature", {"a": 3, "b": 1, "c": 6}),
            _int_hist_feature(
                "numeric_feature", [(5.0, 6.0, 1.0), (6.0, 7.0, 1.0)]
            ),
        ]
    )
    result = validate_statistics(training, schema, serving_statistics=serving)
    amap = anomaly_map(result)
    assert amap == {
        "string_feature": ({AT.COMPARATOR_L_INFTY_HIGH}, Severity.ERROR),
        "numeric_feature": (
            {AT.COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH},
            Severity.ERROR,
        ),
    }
    measurements = {
        m.feature: (m.metric, m.value, m.threshold) for m in result.drift_skew_info
    }
    assert measurements["string_feature"] == ("L_INFTY", pytest.approx(0.2), 0.1)
    assert measurements["numeric_feature"] == (
        "JENSEN_SHANNON_DIVERGENCE",
        pytest.approx(1.0),
        0.1,
    )
    jsd = result.feature_anomaly_info()["numeric_feature"]["reasons"][0]
    assert jsd["description"] == (
        "The approximate Jensen-Shannon divergence between training and serving "
        "is 1 (up to six significant digits), above the threshold 0.1."
    )


def test_golden_custom_domain_update_never_overwrites():
    """schema_test.cc:430-560 UpdateSchemaCustomDomains — stats claim
    `domain_info: url_domain {}` for every feature, but only the feature with
    NO existing domain gains url_domain; nl/image/time/string domains are all
    kept untouched (domain_info never overwrites, custom_domain_util.cc)."""
    from data_validation_spark.schema import (
        ImageDomain,
        NaturalLanguageDomain,
        TimeDomain,
    )
    from data_validation_spark.validate.infer import update_schema

    schema = Schema(
        feature=[
            FeatureSpec(
                name="nl_feature", type=FeatureType.BYTES,
                presence=Presence(min_count=1), value_count=ValueCount(min=1),
                natural_language_domain=NaturalLanguageDomain(),
            ),
            FeatureSpec(
                name="image_feature", type=FeatureType.BYTES,
                presence=Presence(min_count=1), value_count=ValueCount(min=1),
                image_domain=ImageDomain(),
            ),
            FeatureSpec(
                name="time_feature", type=FeatureType.BYTES,
                presence=Presence(min_count=1), value_count=ValueCount(min=1),
                time_domain=TimeDomain(string_format="%Y/%m/%d"),
            ),
            FeatureSpec(
                name="string_feature", type=FeatureType.BYTES,
                presence=Presence(min_count=1), value_count=ValueCount(min=1),
                string_domain=StringDomain(name="", value=[]),
            ),
            FeatureSpec(
                name="nodomain_feature", type=FeatureType.BYTES,
                presence=Presence(min_count=1), value_count=ValueCount(min=1),
            ),
        ]
    )
    feats = []
    for name in ("nl_feature", "image_feature", "time_feature",
                 "string_feature", "nodomain_feature"):
        fs = string_feature(name, {"v": 1})
        fs.custom = {"domain_info": "url_domain {}"}
        feats.append(fs)
    stats = stats_of(feats, num_examples=1)
    fixed = update_schema(schema, stats)

    assert fixed.get_feature("nl_feature").natural_language_domain is not None
    assert fixed.get_feature("nl_feature").url_domain is None
    assert fixed.get_feature("image_feature").image_domain is not None
    assert fixed.get_feature("image_feature").url_domain is None
    assert fixed.get_feature("time_feature").time_domain.string_format == "%Y/%m/%d"
    assert fixed.get_feature("time_feature").url_domain is None
    assert fixed.get_feature("string_feature").string_domain is not None
    assert fixed.get_feature("string_feature").url_domain is None
    assert fixed.get_feature("nodomain_feature").url_domain is not None
