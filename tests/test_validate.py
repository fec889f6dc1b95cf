"""Validation-engine tests — fixtures modeled on the reference's
validation_api_test.py / schema_test.cc cases, one per anomaly reason family.
These operate on hand-built stats artifacts (no Spark needed)."""

import pytest

from data_validation_spark.anomalies import AnomalyType as AT
from data_validation_spark.schema import (
    BoolDomain,
    DatasetConstraints,
    DriftComparator,
    FeatureSpec,
    FeatureType,
    FloatDomain,
    ImageDomain,
    IntDomain,
    NumExamplesVersionComparator,
    Presence,
    Schema,
    SkewComparator,
    StringDomain,
    UniqueConstraints,
    ValueCount,
)
from data_validation_spark.stats.result import (
    BytesStats,
    CommonStats,
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
    Histogram,
    HistogramBucket,
    NumericStats,
    RankBucket,
    StringStats,
)
from data_validation_spark.validate.infer import infer_schema, update_schema
from data_validation_spark.validate.rules import validate_statistics


def make_feature(
    name,
    type_="INT",
    non_missing=10,
    missing=0,
    min_vals=1,
    max_vals=1,
    numeric=None,
    string=None,
    bytes_=None,
    custom=None,
):
    fs = FeatureStats(name=name, type=type_)
    fs.common = CommonStats(
        num_non_missing=non_missing,
        num_missing=missing,
        min_num_values=min_vals,
        max_num_values=max_vals,
        tot_num_values=non_missing * max_vals,
        avg_num_values=float(max_vals),
    )
    fs.numeric = numeric
    fs.string = string
    fs.bytes = bytes_
    fs.custom = custom or {}
    return fs


def make_stats(features, num_examples=10):
    ds = DatasetStats(num_examples=num_examples)
    for f in features:
        ds.features[f.name] = f
    return DatasetStatsList([ds])


def types(result, feature=None):
    return {
        a.type for a in result.anomalies if feature is None or a.feature == feature
    }


def test_clean_pass():
    stats = make_stats([make_feature("a", numeric=NumericStats(min=1, max=5, mean=3))])
    schema = Schema(
        feature=[
            FeatureSpec(
                name="a",
                type=FeatureType.INT,
                presence=Presence(min_count=1, min_fraction=1.0),
                int_domain=IntDomain(min=0, max=10),
            )
        ]
    )
    result = validate_statistics(stats, schema)
    assert result.passed
    assert result.anomalies == []


def test_data_missing():
    result = validate_statistics(DatasetStatsList([DatasetStats(num_examples=0)]), Schema())
    assert AT.DATA_MISSING in types(result)
    assert not result.passed


def test_new_column():
    stats = make_stats([make_feature("a"), make_feature("b")])
    schema = Schema(feature=[FeatureSpec(name="a")])
    assert types(validate_statistics(stats, schema), "b") == {AT.SCHEMA_NEW_COLUMN}


def test_missing_column():
    stats = make_stats([make_feature("a")])
    schema = Schema(
        feature=[
            FeatureSpec(name="a"),
            FeatureSpec(name="gone", presence=Presence(min_count=1)),
            FeatureSpec(name="optional_gone"),  # not required → no anomaly
        ]
    )
    result = validate_statistics(stats, schema)
    assert types(result, "gone") == {AT.SCHEMA_MISSING_COLUMN}
    assert types(result, "optional_gone") == set()


def test_presence_min_count_and_fraction():
    stats = make_stats([make_feature("a", non_missing=4, missing=6)])
    schema = Schema(
        feature=[FeatureSpec(name="a", presence=Presence(min_count=5, min_fraction=0.5))]
    )
    got = types(validate_statistics(stats, schema), "a")
    assert AT.FEATURE_TYPE_LOW_NUMBER_PRESENT in got
    assert AT.FEATURE_TYPE_LOW_FRACTION_PRESENT in got


def test_presence_epsilon_at_one():
    # fraction 0.99995 with min_fraction=1.0 → tolerated (reference epsilon).
    stats = make_stats(
        [make_feature("a", non_missing=99995, missing=5)], num_examples=100000
    )
    schema = Schema(feature=[FeatureSpec(name="a", presence=Presence(min_fraction=1.0))])
    assert validate_statistics(stats, schema).passed


def test_feature_never_present():
    stats = make_stats([make_feature("a", non_missing=0, missing=10, min_vals=0, max_vals=0)])
    schema = Schema(feature=[FeatureSpec(name="a", presence=Presence(min_count=1))])
    assert types(validate_statistics(stats, schema), "a") == {AT.FEATURE_TYPE_NOT_PRESENT}


def test_type_mismatch():
    stats = make_stats([make_feature("a", type_="STRING", string=StringStats(unique=3))])
    schema = Schema(feature=[FeatureSpec(name="a", type=FeatureType.INT)])
    assert AT.UNEXPECTED_DATA_TYPE in types(validate_statistics(stats, schema), "a")


def test_int_stats_ok_for_float_schema():
    stats = make_stats([make_feature("a", type_="INT", numeric=NumericStats(min=1, max=2))])
    schema = Schema(feature=[FeatureSpec(name="a", type=FeatureType.FLOAT)])
    assert validate_statistics(stats, schema).passed


def test_value_counts():
    stats = make_stats([make_feature("a", min_vals=0, max_vals=7)])
    schema = Schema(feature=[FeatureSpec(name="a", value_count=ValueCount(min=1, max=3))])
    got = types(validate_statistics(stats, schema), "a")
    assert got == {AT.FEATURE_TYPE_LOW_NUMBER_VALUES, AT.FEATURE_TYPE_HIGH_NUMBER_VALUES}


def _nested_feature(name, levels):
    """Feature with presence_and_valency for ``levels`` nest levels:
    levels = [(min, max), ...] outermost first."""
    from data_validation_spark.stats.result import PresenceAndValency

    f = make_feature(name, min_vals=levels[-1][0], max_vals=levels[-1][1])
    f.common.presence_and_valency = [
        PresenceAndValency(
            num_non_missing=10, min_num_values=lo, max_num_values=hi,
            tot_num_values=10 * hi,
        )
        for lo, hi in levels
    ]
    return f


def test_value_count_nestedness_mismatch():
    # Singular value_count on a nestedness-2 feature → VALUE_NESTEDNESS_MISMATCH
    # (feature_util.cc:140-150), and the per-level bounds are NOT checked.
    stats = make_stats([_nested_feature("a", [(1, 2), (0, 9)])])
    schema = Schema(feature=[FeatureSpec(name="a", value_count=ValueCount(min=1, max=3))])
    assert types(validate_statistics(stats, schema), "a") == {AT.VALUE_NESTEDNESS_MISMATCH}


def test_value_counts_per_level():
    stats = make_stats([_nested_feature("a", [(1, 2), (0, 9)])])
    # wrong number of levels → nestedness mismatch (feature_util.cc:173-185)
    schema = Schema(feature=[FeatureSpec(name="a", value_counts=[ValueCount(min=1)])])
    assert types(validate_statistics(stats, schema), "a") == {AT.VALUE_NESTEDNESS_MISMATCH}
    # right level count → per-level low/high checks
    schema = Schema(
        feature=[
            FeatureSpec(
                name="a",
                value_counts=[ValueCount(min=1, max=2), ValueCount(min=1, max=3)],
            )
        ]
    )
    result = validate_statistics(stats, schema)
    got = types(result, "a")
    assert got == {AT.FEATURE_TYPE_LOW_NUMBER_VALUES, AT.FEATURE_TYPE_HIGH_NUMBER_VALUES}
    assert any("nestedness level 1" in a.description for a in result.anomalies)
    # satisfied bounds → clean
    schema = Schema(
        feature=[
            FeatureSpec(
                name="a",
                value_counts=[ValueCount(min=1, max=2), ValueCount(max=9)],
            )
        ]
    )
    assert validate_statistics(stats, schema).passed


def test_derived_feature_reasons():
    # Stats mark the feature derived, schema lacks the source → INVALID_SOURCE.
    f = make_feature("d")
    f.custom["validation_derived_source"] = "src_col"
    stats = make_stats([f])
    schema = Schema(feature=[FeatureSpec(name="d")])
    assert types(validate_statistics(stats, schema), "d") == {
        AT.DERIVED_FEATURE_INVALID_SOURCE
    }
    # Schema has the source but the wrong lifecycle → BAD_LIFECYCLE.
    schema = Schema(feature=[FeatureSpec(name="d", validation_derived_source="src_col")])
    assert types(validate_statistics(stats, schema), "d") == {
        AT.DERIVED_FEATURE_BAD_LIFECYCLE
    }
    # Correct lifecycle → clean.
    schema = Schema(
        feature=[
            FeatureSpec(
                name="d",
                validation_derived_source="src_col",
                lifecycle_stage="VALIDATION_DERIVED",
            )
        ]
    )
    assert validate_statistics(stats, schema).passed


def test_severity_overrides_and_rollup():
    from data_validation_spark.anomalies import Severity

    stats = make_stats([make_feature("a"), make_feature("extra")])
    schema = Schema(
        feature=[FeatureSpec(name="a", type=FeatureType.BYTES, value_count=ValueCount(max=0))]
    )
    # default: everything ERROR → fails
    assert not validate_statistics(stats, schema).passed
    # overrides downgrade both reasons → passes (WARNINGs only)
    r = validate_statistics(
        stats,
        schema,
        severity_overrides={
            AT.SCHEMA_NEW_COLUMN: Severity.WARNING,
            AT.UNEXPECTED_DATA_TYPE: Severity.WARNING,
            AT.FEATURE_TYPE_HIGH_NUMBER_VALUES: Severity.WARNING,
        },
    )
    assert r.passed
    assert all(a.severity == Severity.WARNING for a in r.anomalies)
    # legacy flag: only SCHEMA_NEW_COLUMN becomes WARNING
    r2 = validate_statistics(stats, schema, new_features_are_warnings=True)
    sev = {a.type: a.severity for a in r2.anomalies}
    assert sev[AT.SCHEMA_NEW_COLUMN] == Severity.WARNING
    assert sev[AT.UNEXPECTED_DATA_TYPE] == Severity.ERROR
    # MULTIPLE_REASONS roll-up: feature 'a' has 2 reasons → aggregate type
    info = r2.feature_anomaly_info()
    assert info["a"]["type"] == AT.MULTIPLE_REASONS.value
    assert info["a"]["short_description"] == "Multiple errors"
    assert len(info["a"]["reasons"]) == 2
    assert info["extra"]["type"] == AT.SCHEMA_NEW_COLUMN.value
    assert info["extra"]["severity"] == "WARNING"


def test_fixed_shape():
    from data_validation_spark.schema import FixedShape

    stats = make_stats([make_feature("a", missing=2, min_vals=1, max_vals=1)])
    schema = Schema(feature=[FeatureSpec(name="a", shape=FixedShape(dim=[1]))])
    assert AT.INVALID_FEATURE_SHAPE in types(validate_statistics(stats, schema), "a")


def test_int_domain():
    stats = make_stats([make_feature("a", numeric=NumericStats(min=-5, max=100))])
    schema = Schema(feature=[FeatureSpec(name="a", int_domain=IntDomain(min=0, max=50))])
    got = types(validate_statistics(stats, schema), "a")
    assert got == {AT.INT_TYPE_SMALL_INT, AT.INT_TYPE_BIG_INT}


def test_float_domain_nan_inf():
    stats = make_stats(
        [
            make_feature(
                "a",
                type_="FLOAT",
                numeric=NumericStats(
                    min=0.0, max=float("inf"), num_nan=2, num_pos_inf=1
                ),
            )
        ]
    )
    schema = Schema(
        feature=[
            FeatureSpec(
                name="a",
                float_domain=FloatDomain(max=10.0, disallow_nan=True, disallow_inf=True),
            )
        ]
    )
    got = types(validate_statistics(stats, schema), "a")
    assert got == {AT.FLOAT_TYPE_BIG_FLOAT, AT.FLOAT_TYPE_HAS_NAN, AT.FLOAT_TYPE_HAS_INF}


def _string_feature(name, counts, invalid_utf8=0):
    rh = [RankBucket(i + 1, i + 1, k, v) for i, (k, v) in enumerate(counts.items())]
    return make_feature(
        name,
        type_="STRING",
        string=StringStats(
            unique=len(counts),
            top_values=list(counts.items()),
            rank_histogram=rh,
            invalid_utf8_count=invalid_utf8,
        ),
    )


def test_string_domain_off_values():
    stats = make_stats([_string_feature("fmt", {"png": 6.0, "jpeg": 3.0, "tiff": 1.0})])
    schema = Schema(
        feature=[
            FeatureSpec(
                name="fmt",
                type=FeatureType.BYTES,
                string_domain=StringDomain(value=["png", "jpeg"], min_domain_mass=0.95),
            )
        ]
    )
    result = validate_statistics(stats, schema)
    assert types(result, "fmt") == {AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES}
    a = result.anomalies[0]
    assert a.measurement == pytest.approx(0.1)
    # within tolerance → passes
    schema.feature[0].string_domain.min_domain_mass = 0.9
    assert validate_statistics(stats, schema).passed


def test_string_domain_shared():
    stats = make_stats([_string_feature("fmt", {"png": 1.0, "bad": 9.0})])
    schema = Schema(
        feature=[FeatureSpec(name="fmt", type=FeatureType.BYTES, domain="formats")],
        string_domain=[StringDomain(name="formats", value=["png"])],
    )
    assert AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES in types(validate_statistics(stats, schema))


def test_invalid_utf8():
    stats = make_stats([_string_feature("s", {"a": 5.0}, invalid_utf8=3)])
    schema = Schema(
        feature=[
            FeatureSpec(name="s", type=FeatureType.BYTES, string_domain=StringDomain(value=["a"]))
        ]
    )
    assert AT.ENUM_TYPE_INVALID_UTF8 in types(validate_statistics(stats, schema), "s")


def test_bool_domain():
    stats = make_stats([make_feature("b", numeric=NumericStats(min=0, max=3))])
    schema = Schema(feature=[FeatureSpec(name="b", bool_domain=BoolDomain())])
    assert AT.BOOL_TYPE_BIG_INT in types(validate_statistics(stats, schema), "b")


def test_unique_constraints():
    stats = make_stats([_string_feature("s", {"a": 1.0, "b": 1.0})])
    schema = Schema(
        feature=[FeatureSpec(name="s", unique_constraints=UniqueConstraints(min=5, max=None))]
    )
    assert AT.FEATURE_TYPE_LOW_UNIQUE in types(validate_statistics(stats, schema), "s")
    schema.feature[0].unique_constraints = UniqueConstraints(min=1, max=1)
    assert AT.FEATURE_TYPE_HIGH_UNIQUE in types(validate_statistics(stats, schema), "s")
    # no string stats → NO_UNIQUE
    stats2 = make_stats([make_feature("s", numeric=NumericStats())])
    schema.feature[0].unique_constraints = UniqueConstraints(min=1)
    assert AT.FEATURE_TYPE_NO_UNIQUE in types(validate_statistics(stats2, schema), "s")


def test_image_domain():
    fs = make_feature(
        "img",
        type_="BYTES",
        bytes_=BytesStats(max_num_bytes=5000.0),
        custom={"image_format_histogram": {"jpeg": 50, "png": 20, "UNKNOWN": 30}},
    )
    stats = make_stats([fs])
    schema = Schema(
        feature=[
            FeatureSpec(
                name="img",
                image_domain=ImageDomain(
                    minimum_supported_image_fraction=0.8, max_image_byte_size=4000
                ),
            )
        ]
    )
    got = types(validate_statistics(stats, schema), "img")
    assert got == {AT.LOW_SUPPORTED_IMAGE_FRACTION, AT.MAX_IMAGE_BYTE_SIZE_EXCEEDED}


def test_dataset_constraints():
    stats = make_stats([make_feature("a")], num_examples=10)
    schema = Schema(
        feature=[FeatureSpec(name="a")],
        dataset_constraints=DatasetConstraints(min_examples_count=100),
    )
    assert AT.DATASET_LOW_NUM_EXAMPLES in types(validate_statistics(stats, schema))
    schema.dataset_constraints = DatasetConstraints(max_examples_count=5)
    assert AT.DATASET_HIGH_NUM_EXAMPLES in types(validate_statistics(stats, schema))


def test_num_examples_drift():
    stats = make_stats([make_feature("a")], num_examples=10)
    prev = make_stats([make_feature("a")], num_examples=100)
    schema = Schema(
        feature=[FeatureSpec(name="a")],
        dataset_constraints=DatasetConstraints(
            num_examples_drift_comparator=NumExamplesVersionComparator(
                min_fraction_threshold=0.5, max_fraction_threshold=2.0
            )
        ),
    )
    result = validate_statistics(stats, schema, previous_statistics=prev)
    assert AT.COMPARATOR_LOW_NUM_EXAMPLES in types(result)


def test_drift_linfty():
    cur = make_stats([_string_feature("fmt", {"png": 5.0, "jpeg": 5.0})])
    prev = make_stats([_string_feature("fmt", {"png": 9.0, "jpeg": 1.0})])
    schema = Schema(
        feature=[
            FeatureSpec(name="fmt", drift_comparator=DriftComparator(infinity_norm_threshold=0.1))
        ]
    )
    result = validate_statistics(cur, schema, previous_statistics=prev)
    assert AT.COMPARATOR_L_INFTY_HIGH in types(result, "fmt")
    m = result.drift_skew_info[0]
    assert m.metric == "L_INFTY"
    assert m.value == pytest.approx(0.4)
    # below threshold → measurement only, no anomaly
    schema.feature[0].drift_comparator.infinity_norm_threshold = 0.5
    result2 = validate_statistics(cur, schema, previous_statistics=prev)
    assert AT.COMPARATOR_L_INFTY_HIGH not in types(result2, "fmt")
    assert result2.drift_skew_info[0].value == pytest.approx(0.4)


def test_drift_control_missing():
    cur = make_stats([_string_feature("fmt", {"png": 5.0})])
    schema = Schema(
        feature=[
            FeatureSpec(name="fmt", drift_comparator=DriftComparator(infinity_norm_threshold=0.1))
        ]
    )
    # no control stats at all → comparator skipped entirely
    assert validate_statistics(cur, schema).passed
    # control stats present but feature absent → CONTROL_DATA_MISSING
    prev = make_stats([make_feature("other")])
    result = validate_statistics(cur, schema, previous_statistics=prev)
    assert AT.COMPARATOR_CONTROL_DATA_MISSING in types(result, "fmt")


def test_skew_jsd_numeric():
    def hist(buckets):
        return Histogram("STANDARD", [HistogramBucket(*b) for b in buckets])

    cur = make_stats(
        [make_feature("x", type_="FLOAT", numeric=NumericStats(histograms=[hist([(0, 1, 10)])]))]
    )
    serv = make_stats(
        [make_feature("x", type_="FLOAT", numeric=NumericStats(histograms=[hist([(5, 6, 10)])]))]
    )
    schema = Schema(
        feature=[
            FeatureSpec(
                name="x", skew_comparator=SkewComparator(jensen_shannon_divergence_threshold=0.5)
            )
        ]
    )
    result = validate_statistics(cur, schema, serving_statistics=serv)
    assert AT.COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH in types(result, "x")
    assert result.drift_skew_info[0].value == pytest.approx(1.0)


def test_environments():
    stats = make_stats([make_feature("a")])
    # Reference convention (schema.cc:697-714 + feature_statistics_validator
    # tests): default_environment lists the environments every feature belongs
    # to by default; not_in_environment carves the label out of SERVING.
    schema = Schema(
        feature=[
            FeatureSpec(name="a"),
            FeatureSpec(
                name="label", presence=Presence(min_count=1), not_in_environment=["SERVING"]
            ),
        ],
        default_environment=["TRAINING", "SERVING"],
    )
    # TRAINING: label required but missing → anomaly
    assert not validate_statistics(stats, schema, environment="TRAINING").passed
    # SERVING: label excluded → clean (the 'a' feature is fine)
    r = validate_statistics(stats, schema, environment="SERVING")
    assert types(r, "label") == set()
    # No environment requested → every feature is in scope (schema.cc:711-713)
    assert not validate_statistics(stats, schema, environment=None).passed
    # in_environment wins over not_in_environment (checked first)
    schema2 = Schema(
        feature=[
            FeatureSpec(
                name="label",
                presence=Presence(min_count=1),
                in_environment=["SERVING"],
                not_in_environment=["SERVING"],
            ),
        ],
    )
    assert not validate_statistics(stats, schema2, environment="SERVING").passed
    # environment not in default_environment and no annotations → excluded
    schema3 = Schema(
        feature=[FeatureSpec(name="a"), FeatureSpec(name="label", presence=Presence(min_count=1))]
    )
    assert validate_statistics(stats, schema3, environment="EVAL").passed


# ---------------------------------------------------------------- inference
def test_infer_schema_roundtrip():
    stats = make_stats(
        [
            make_feature("i", numeric=NumericStats(min=1, max=5)),
            _string_feature("s", {"a": 6.0, "b": 4.0}),
        ]
    )
    schema = infer_schema(stats)
    assert schema.get_feature("i").type == FeatureType.INT
    assert schema.get_feature("s").type == FeatureType.BYTES
    assert schema.get_feature("s").string_domain.value == ["a", "b"]
    assert schema.get_feature("i").presence.min_fraction == 1.0
    # inferred schema must validate its own stats cleanly
    assert validate_statistics(stats, schema).passed


def test_infer_large_domain_skipped():
    counts = {f"v{i}": 1.0 for i in range(500)}
    stats = make_stats([_string_feature("s", counts)])
    schema = infer_schema(stats)
    assert schema.get_feature("s").string_domain is None


def test_update_schema_fixes_anomalies():
    stats = make_stats(
        [
            make_feature("a", non_missing=5, missing=5, numeric=NumericStats(min=-5, max=100)),
            _string_feature("fmt", {"png": 5.0, "tiff": 5.0}),
            make_feature("new_col"),
        ]
    )
    schema = Schema(
        feature=[
            FeatureSpec(
                name="a",
                type=FeatureType.INT,
                presence=Presence(min_count=1, min_fraction=1.0),
                int_domain=IntDomain(min=0, max=50),
            ),
            FeatureSpec(
                name="fmt",
                type=FeatureType.BYTES,
                string_domain=StringDomain(value=["png"]),
            ),
        ]
    )
    assert not validate_statistics(stats, schema).passed
    fixed = update_schema(schema, stats)
    result = validate_statistics(stats, fixed)
    assert result.passed, result.to_json()
    assert fixed.get_feature("new_col") is not None
    assert "tiff" in fixed.resolve_string_domain(fixed.get_feature("fmt")).value


def test_int_domain_on_string_feature():
    ok = make_stats([_string_feature("s", {"1": 3.0, "42": 2.0})])
    schema = Schema(feature=[FeatureSpec(name="s", int_domain=IntDomain(min=0, max=100))])
    assert validate_statistics(ok, schema).passed
    # out of range after parsing
    big = make_stats([_string_feature("s", {"1": 3.0, "999": 2.0})])
    assert AT.INT_TYPE_BIG_INT in types(validate_statistics(big, schema), "s")
    # non-integer string
    bad = make_stats([_string_feature("s", {"1": 3.0, "abc": 2.0})])
    assert types(validate_statistics(bad, schema), "s") == {AT.INT_TYPE_NOT_INT_STRING}


def test_float_domain_on_string_feature():
    ok = make_stats([_string_feature("s", {"1.5": 3.0, "2e3": 2.0})])
    schema = Schema(feature=[FeatureSpec(name="s", float_domain=FloatDomain())])
    assert validate_statistics(ok, schema).passed
    bad = make_stats([_string_feature("s", {"1.5": 3.0, "xyz": 2.0})])
    assert AT.FLOAT_TYPE_STRING_NOT_FLOAT in types(validate_statistics(bad, schema), "s")


def test_sparse_weighted_name_collision():
    from data_validation_spark.schema import SparseFeature, WeightedFeature

    stats = make_stats([make_feature("x"), make_feature("y")])
    schema = Schema(
        feature=[FeatureSpec(name="x"), FeatureSpec(name="y")],
        sparse_feature=[SparseFeature(name="x", index_feature="i", value_feature="v")],
        weighted_feature=[WeightedFeature(name="y", feature="f", weight_feature="w")],
    )
    r = validate_statistics(stats, schema)
    assert AT.SPARSE_FEATURE_NAME_COLLISION in types(r, "x")
    assert AT.WEIGHTED_FEATURE_NAME_COLLISION in types(r, "y")
    # weighted collision with a SPARSE feature of the same name also fires
    schema2 = Schema(
        sparse_feature=[SparseFeature(name="z", index_feature="i", value_feature="v")],
        weighted_feature=[WeightedFeature(name="z", feature="f", weight_feature="w")],
    )
    r2 = validate_statistics(make_stats([make_feature("a")]), schema2)
    got = types(r2, "z")
    assert AT.WEIGHTED_FEATURE_NAME_COLLISION in got
    # per the reference precedence the colliding pair is deprecated: no
    # SPARSE_FEATURE_NAME_COLLISION double-report for the same name
    assert AT.SPARSE_FEATURE_NAME_COLLISION not in got


def test_schema_hygiene_reasons():
    stats = make_stats([make_feature("a")])
    schema = Schema(
        feature=[
            FeatureSpec(name="a"),
            FeatureSpec(name="", presence=Presence(min_count=1)),
            FeatureSpec(name="d", domain="shared", presence=Presence(min_fraction=-0.5)),
        ]
    )
    r = validate_statistics(stats, schema)
    assert AT.FEATURE_MISSING_NAME in types(r, "")
    got_d = types(r, "d")
    assert AT.FEATURE_MISSING_TYPE in got_d
    assert AT.INVALID_SCHEMA_SPECIFICATION in got_d


def test_semantic_domain_update():
    f = make_feature("cap", type_="STRING", string=StringStats(unique=5))
    f.custom["domain_info"] = "natural_language_domain {}"
    stats = make_stats([f])
    # schema has NO domain on 'cap' → best-effort semantic update reported
    schema = Schema(feature=[FeatureSpec(name="cap")])
    assert AT.SEMANTIC_DOMAIN_UPDATE in types(validate_statistics(stats, schema), "cap")
    # with a domain already set, no update
    from data_validation_spark.schema import NaturalLanguageDomain

    schema2 = Schema(
        feature=[FeatureSpec(name="cap", natural_language_domain=NaturalLanguageDomain())]
    )
    assert AT.SEMANTIC_DOMAIN_UPDATE not in types(validate_statistics(stats, schema2), "cap")


def test_update_schema_fixes_new_reasons():
    from data_validation_spark.schema import NaturalLanguageDomain, TokenConstraint

    # nestedness mismatch → per-level value_counts installed
    stats = make_stats([_nested_feature("a", [(1, 2), (0, 9)])])
    schema = Schema(feature=[FeatureSpec(name="a", value_count=ValueCount(min=1, max=3))])
    fixed = update_schema(schema, stats)
    spec = fixed.get_feature("a")
    assert spec.value_count is None
    assert [(vc.min, vc.max) for vc in spec.value_counts] == [(1, 2), (None, 9)]
    assert validate_statistics(stats, fixed).passed

    # derived feature → source + lifecycle installed
    f = make_feature("d")
    f.custom["validation_derived_source"] = "src"
    stats2 = make_stats([f])
    fixed2 = update_schema(Schema(feature=[FeatureSpec(name="d")]), stats2)
    d = fixed2.get_feature("d")
    assert d.validation_derived_source == "src"
    assert d.lifecycle_stage == "VALIDATION_DERIVED"
    assert validate_statistics(stats2, fixed2).passed

    # NL token constraint relaxed to the observed fraction
    f3 = make_feature("t", type_="STRING", string=StringStats(unique=3))
    f3.custom["nl_statistics"] = {
        "feature_coverage": 0.4,
        "avg_token_length": 2.0,
        "token_statistics": {
            "the": {
                "fraction_of_sequences": 0.2,
                "per_sequence_min_frequency": 1,
                "per_sequence_max_frequency": 4,
            }
        },
    }
    schema3 = Schema(
        feature=[
            FeatureSpec(
                name="t",
                natural_language_domain=NaturalLanguageDomain(
                    min_coverage=0.9,
                    token_constraints=[
                        TokenConstraint(value="the", min_fraction_of_sequences=0.8,
                                        max_per_sequence=2)
                    ],
                ),
            )
        ]
    )
    fixed3 = update_schema(schema3, stats := make_stats([f3]))
    d3 = fixed3.get_feature("t").natural_language_domain
    assert d3.min_coverage == pytest.approx(0.4)
    assert d3.token_constraints[0].min_fraction_of_sequences == pytest.approx(0.2)
    assert d3.token_constraints[0].max_per_sequence == 4
    assert validate_statistics(stats, fixed3).passed


def test_validate_corresponding_slices():
    """Port of the reference's test_distributional_anomaly_between_slices:
    drift is evaluated slice-against-corresponding-slice."""
    from data_validation_spark.validate.rules import validate_corresponding_slices

    def sliced(v1_counts, v2_counts):
        s_all = DatasetStats(slice_key="All Examples", num_examples=4)
        s1 = DatasetStats(slice_key="slice1", num_examples=2)
        s2 = DatasetStats(slice_key="slice2", num_examples=2)
        s1.features["foo"] = _string_feature("foo", v1_counts)
        s2.features["foo"] = _string_feature("foo", v2_counts)
        s_all.features["foo"] = _string_feature(
            "foo", {k: v1_counts.get(k, 0) + v2_counts.get(k, 0)
                    for k in set(v1_counts) | set(v2_counts)}
        )
        return DatasetStatsList([s_all, s1, s2])

    cur = sliced({"1": 1.0, "2": 1.0}, {"3": 1.0, "4": 1.0})
    prev = sliced({"1": 1.0, "2": 1.0}, {"1": 1.0, "2": 1.0})
    schema = Schema(
        feature=[
            FeatureSpec(
                name="foo",
                type=FeatureType.BYTES,
                drift_comparator=DriftComparator(infinity_norm_threshold=0.3),
            )
        ]
    )
    r = validate_corresponding_slices(cur, schema, previous_statistics=prev)
    drifted = {a.feature for a in r.anomalies
               if a.type == AT.COMPARATOR_L_INFTY_HIGH}
    # slice2's distribution flipped entirely (L∞ = 0.5 > 0.3); slice1 and the
    # overall slice are within threshold
    assert drifted == {"slice(slice2)::foo"}


def test_annotated_enum_multi_reason_golden():
    """Mirror of the reference's _annotated_enum_anomaly_info golden
    (validation_api_test.py:1499-1515): an off-domain enum value combined with
    L-infinity drift on the same feature rolls up to 'Multiple errors'."""
    cur = make_stats(
        [_string_feature("annotated_enum", {"a": 3.0, "b": 1.0})], num_examples=4
    )
    prev = make_stats([_string_feature("annotated_enum", {"a": 4.0})], num_examples=4)
    schema = Schema(
        feature=[
            FeatureSpec(
                name="annotated_enum",
                type=FeatureType.BYTES,
                string_domain=StringDomain(value=["a"]),
                drift_comparator=DriftComparator(infinity_norm_threshold=0.01),
            )
        ]
    )
    r = validate_statistics(cur, schema, previous_statistics=prev)
    got = types(r, "annotated_enum")
    assert got == {AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES, AT.COMPARATOR_L_INFTY_HIGH}
    # L∞ = |0.25 - 0| = 0.25 on value 'b' (reference golden value)
    linf = [m for m in r.drift_skew_info if m.metric == "L_INFTY"][0]
    assert linf.value == pytest.approx(0.25)
    info = r.feature_anomaly_info()["annotated_enum"]
    assert info["type"] == AT.MULTIPLE_REASONS.value
    assert info["short_description"] == "Multiple errors"
    assert len(info["reasons"]) == 2


def test_domain_type_mismatch_reference():
    """AllowedFeatureTypes gate (schema.cc:81-115,820-831): a domain on an
    incompatible DECLARED type reports DOMAIN_INVALID_FOR_TYPE with the
    reference's exact rendering and skips the domain's own checks."""
    stats = make_stats(
        [make_feature("a", type_="FLOAT", numeric=NumericStats(min=-5.0, max=99.0))]
    )
    schema = Schema(feature=[FeatureSpec(
        name="a", type=FeatureType.FLOAT, int_domain=IntDomain(min=0, max=50),
    )])
    r = validate_statistics(stats, schema)
    assert types(r, "a") == {AT.DOMAIN_INVALID_FOR_TYPE}
    a = next(x for x in r.anomalies if x.type == AT.DOMAIN_INVALID_FOR_TYPE)
    assert a.short_description == "The domain does not match the type"
    assert a.description == 'The domain "int_domain" does not match the type: FLOAT'
    # int_domain on INT and BYTES types stays allowed
    ok = Schema(feature=[FeatureSpec(
        name="a", type=FeatureType.INT, int_domain=IntDomain(min=-10, max=100),
    )])
    stats_int = make_stats([make_feature("a", numeric=NumericStats(min=-5, max=99))])
    assert validate_statistics(stats_int, ok).passed
    # string_domain on INT type → mismatch ("domain"/"string_domain" are BYTES-only)
    s2 = Schema(feature=[FeatureSpec(
        name="a", type=FeatureType.INT, string_domain=StringDomain(value=["x"]),
    )])
    assert AT.DOMAIN_INVALID_FOR_TYPE in types(validate_statistics(stats_int, s2), "a")


def test_int_domain_invalid_int64_reference_goldens():
    """int_domain_test.cc:89-103 'Too large categorical int' and :128-138
    'Too large int with bounds': values that are not valid Int64 invalidate
    the DOMAIN (not the values) on INT-typed features with bounds."""
    # categorical INT: rank-histogram label beyond int64
    f = _string_feature("bar", {"50000000000000000000000000000": 1.0,
                                "10000000000000000000000000000": 1.0})
    f.type = "INT"
    stats = make_stats([f])
    schema = Schema(feature=[FeatureSpec(name="bar", int_domain=IntDomain(max=1000))])
    r = validate_statistics(stats, schema)
    assert AT.DOMAIN_INVALID_FOR_TYPE in types(r, "bar")
    a = next(x for x in r.anomalies if x.type == AT.DOMAIN_INVALID_FOR_TYPE)
    assert a.short_description == "Invalid values"
    assert "were not valid Int64" in a.description
    # numeric INT: num_stats max beyond int64 with bounds
    big = make_stats([make_feature("bar", numeric=NumericStats(
        min=-1e20, max=1e20))])
    r2 = validate_statistics(big, schema)
    assert AT.DOMAIN_INVALID_FOR_TYPE in types(r2, "bar")
    # no bounds → no anomaly (int_domain_util.cc 'Large int no bounds')
    nb = Schema(feature=[FeatureSpec(name="bar", int_domain=IntDomain())])
    assert validate_statistics(big, nb).passed
    # in-int64-range large values with bounds → plain range checks apply
    ok = make_stats([make_feature("bar", numeric=NumericStats(
        min=-1.5279e18, max=1.5279e18))])
    okschema = Schema(feature=[FeatureSpec(
        name="bar", int_domain=IntDomain(max=1528000000000000000))])
    assert AT.DOMAIN_INVALID_FOR_TYPE not in types(
        validate_statistics(ok, okschema), "bar"
    )


def test_domain_mismatch_does_not_suppress_other_domains():
    """Round-5 review fix: one mismatched domain must not disable validation
    of the feature's OTHER, compatible domains (the dataclass can carry
    several; the reference's proto oneof cannot)."""
    stats = make_stats([make_feature("a", numeric=NumericStats(min=-50, max=99))])
    schema = Schema(feature=[FeatureSpec(
        name="a", type=FeatureType.INT,
        int_domain=IntDomain(min=0, max=10),           # compatible, violated
        image_domain=ImageDomain(max_image_byte_size=1),  # INT-incompatible
    )])
    got = types(validate_statistics(stats, schema), "a")
    assert AT.DOMAIN_INVALID_FOR_TYPE in got          # image_domain flagged
    assert AT.INT_TYPE_SMALL_INT in got               # int_domain still checked
    assert AT.INT_TYPE_BIG_INT in got


def test_struct_domain_on_non_struct_type_flagged():
    """Round-5 review fix: struct_domain on a non-STRUCT declared type fires
    the AllowedFeatureTypes gate (previously flattening cleared the domain
    before the gate ran); its children are not validated; update_schema
    clears only the offending domain."""
    from data_validation_spark.schema import StructDomain

    stats = make_stats([make_feature("a", numeric=NumericStats(min=1, max=2))])
    schema = Schema(feature=[FeatureSpec(
        name="a", type=FeatureType.INT,
        int_domain=IntDomain(min=0, max=10),
        struct_domain=StructDomain(feature=[
            FeatureSpec(name="child", presence=Presence(min_count=1)),
        ]),
    )])
    r = validate_statistics(stats, schema)
    got = types(r, "a")
    assert AT.DOMAIN_INVALID_FOR_TYPE in got
    a = next(x for x in r.anomalies if x.type == AT.DOMAIN_INVALID_FOR_TYPE)
    assert a.description == 'The domain "struct_domain" does not match the type: INT'
    # the mis-typed struct's children never validate (reference ClearDomain)
    assert types(r, "a.child") == set()
    fixed = update_schema(schema, stats)
    spec = fixed.get_feature("a")
    assert spec.struct_domain is None
    assert spec.int_domain is not None  # compatible domain survives the repair
    assert validate_statistics(stats, fixed).passed
