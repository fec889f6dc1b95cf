"""Per-example validation, anomaly-reason slicing, derived features, and
sparse/weighted schema rule wiring."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.anomalies import AnomalyType as AT
from data_validation_spark.schema import (
    FeatureType,
    FeatureSpec,
    IntDomain,
    Presence,
    Schema,
    SparseFeature,
    StringDomain,
    WeightedFeature,
)
from data_validation_spark.stats.engine import compute_statistics
from data_validation_spark.stats.sparse import attach_sparse_weighted_stats
from data_validation_spark.validate.instance import (
    slice_by_anomaly_reason,
    statistics_for_instance,
    validate_instance,
    with_derived_features,
)
from data_validation_spark.validate.rules import validate_statistics


def test_validate_instance_clean():
    schema = Schema(
        feature=[
            FeatureSpec(name="w", int_domain=IntDomain(min=1, max=100),
                        presence=Presence(min_count=1)),
            FeatureSpec(name="fmt", type=FeatureType.BYTES,
                        string_domain=StringDomain(value=["png", "jpeg"])),
        ]
    )
    assert validate_instance({"w": 50, "fmt": "png"}, schema).passed


def test_validate_instance_violations():
    schema = Schema(
        feature=[
            FeatureSpec(name="w", int_domain=IntDomain(min=1, max=100),
                        presence=Presence(min_count=1)),
            FeatureSpec(name="fmt", type=FeatureType.BYTES,
                        string_domain=StringDomain(value=["png", "jpeg"])),
        ]
    )
    r = validate_instance({"w": -5, "fmt": "tiff"}, schema)
    got = {a.type for a in r.anomalies}
    assert AT.INT_TYPE_SMALL_INT in got
    assert AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES in got
    # missing required feature on the row
    r2 = validate_instance({"fmt": "png"}, schema)
    assert AT.SCHEMA_MISSING_COLUMN in {a.type for a in r2.anomalies}


def test_validate_instance_strips_global_only():
    schema = Schema(
        feature=[
            FeatureSpec(name="w", presence=Presence(min_fraction=0.9)),
        ]
    )
    # a single row missing w would be LOW_FRACTION_PRESENT on a dataset, but
    # per-example output strips global-only types (FEATURE_TYPE_NOT_PRESENT
    # is per-example-meaningful and kept by the reference semantics too).
    r = validate_instance({"w": None}, schema)
    assert AT.FEATURE_TYPE_LOW_FRACTION_PRESENT not in {a.type for a in r.anomalies}


def test_statistics_for_instance_lists():
    stats = statistics_for_instance({"arr": [1.0, 2.0, float("nan")], "s": ["a", "a", "b"]})
    ds = stats.default_slice()
    assert ds.feature("arr").common.tot_num_values == 3
    assert ds.feature("arr").numeric.num_nan == 1
    assert ds.feature("s").string.top_values[0] == ("a", 2.0)


def test_slice_by_anomaly_reason(spark):
    df = spark.createDataFrame([(1, 5), (2, -3), (3, 200)], "id long, v long")
    from data_validation_spark.validate.rowlevel import check_row_constraints

    schema = Schema(feature=[FeatureSpec(name="v", int_domain=IntDomain(min=0, max=100))])
    violations = check_row_constraints(df, schema, "id")
    sliced = slice_by_anomaly_reason(df, violations, "id")
    rows = {(r["id"], r["anomaly_reason"]) for r in sliced.collect()}
    assert rows == {(2, "ROW_CONSTRAINT_VIOLATION"), (3, "ROW_CONSTRAINT_VIOLATION")}


def test_with_derived_features(spark):
    df = spark.createDataFrame([(2,)], "x long")
    out = with_derived_features(df, {"x2": F.col("x") * 2})
    assert out.collect()[0]["x2"] == 4


def test_sparse_weighted_rules(spark):
    rows = [
        ([1, 2], [10.0], ["a"], [1.0, 2.0]),
        (None, [5.0], ["b"], None),
    ]
    df = spark.createDataFrame(
        rows, "idx array<int>, val array<double>, wv array<string>, wt array<double>"
    )
    schema = Schema(
        sparse_feature=[SparseFeature(name="sp", index_feature="idx", value_feature="val")],
        weighted_feature=[WeightedFeature(name="wf", feature="wv", weight_feature="wt")],
    )
    stats = compute_statistics(df)
    attach_sparse_weighted_stats(stats, df, schema)
    result = validate_statistics(stats, schema)
    got = {a.type for a in result.anomalies}
    assert AT.SPARSE_FEATURE_MISSING_INDEX in got
    assert AT.SPARSE_FEATURE_LENGTH_MISMATCH in got
    assert AT.WEIGHTED_FEATURE_MISSING_WEIGHT in got
    assert AT.WEIGHTED_FEATURE_LENGTH_MISMATCH in got


def test_schema_json_roundtrip_sparse():
    schema = Schema(
        sparse_feature=[SparseFeature(name="sp", index_feature="i", value_feature="v")],
        weighted_feature=[WeightedFeature(name="wf", feature="f", weight_feature="w")],
    )
    back = Schema.from_json(schema.to_json())
    assert back.sparse_feature[0].index_feature == "i"
    assert back.weighted_feature[0].weight_feature == "w"


# --------------------------------------------------------------------------
# identify_anomalous_examples goldens (validation_api_test.py:43-178, 3159)
# --------------------------------------------------------------------------
def _enum_schema(min_count=1, with_deprecated=False):
    feats = [
        FeatureSpec(
            name="annotated_enum",
            type=FeatureType.BYTES,
            presence=Presence(min_count=min_count),
            string_domain=StringDomain(name="MyAloneEnum", value=["A", "B", "C"]),
        )
    ]
    if with_deprecated:
        feats.append(
            FeatureSpec(
                name="ignore_this",
                type=FeatureType.BYTES,
                presence=Presence(min_count=1),
                lifecycle_stage="DEPRECATED",
            )
        )
    return Schema(feature=feats)


def _reason_keys(instance, schema):
    r = validate_instance(instance, schema)
    return sorted(f"{a.feature}_{a.type.value}" for a in r.anomalies)


def test_identify_anomalous_examples_no_anomalies():
    """validation_api_test.py:44-81 (no_anomalies): in-domain values produce
    nothing, and the DEPRECATED required feature's absence is NOT an anomaly
    (deprecated features are exempt from validation)."""
    schema = _enum_schema(with_deprecated=True)
    assert _reason_keys({"annotated_enum": ["A"]}, schema) == []
    assert _reason_keys({"annotated_enum": ["C"]}, schema) == []


def test_identify_anomalous_examples_same_reason():
    """validation_api_test.py:82-119 (same_anomaly_reason): each 'D' example
    keys to annotated_enum_ENUM_TYPE_UNEXPECTED_STRING_VALUES."""
    schema = _enum_schema()
    for inst, expected in [
        ({"annotated_enum": ["D"]}, ["annotated_enum_ENUM_TYPE_UNEXPECTED_STRING_VALUES"]),
        ({"annotated_enum": ["C"]}, []),
    ]:
        assert _reason_keys(inst, schema) == expected


def test_identify_anomalous_examples_different_reasons():
    """validation_api_test.py:120-158 (different_anomaly_reasons): off-domain
    value vs unknown column key to their distinct reasons (presence
    min_count 0 → the missing annotated_enum in the third example is fine)."""
    schema = _enum_schema(min_count=0)
    assert _reason_keys({"annotated_enum": ["D"]}, schema) == [
        "annotated_enum_ENUM_TYPE_UNEXPECTED_STRING_VALUES"
    ]
    assert _reason_keys({"annotated_enum": ["C"]}, schema) == []
    assert _reason_keys({"feature_not_in_schema": [1]}, schema) == [
        "feature_not_in_schema_SCHEMA_NEW_COLUMN"
    ]


def test_deprecated_lifecycle_stages_exempt():
    """feature_util.cc:239-266 (LifecycleStageIsDeprecated): PLANNED/ALPHA/
    DEPRECATED/DEBUG_ONLY/DISABLED are exempt; BETA/PRODUCTION/
    VALIDATION_DERIVED are validated."""
    for stage, exempt in [
        ("PLANNED", True), ("ALPHA", True), ("DEPRECATED", True),
        ("DEBUG_ONLY", True), ("DISABLED", True),
        ("BETA", False), ("PRODUCTION", False),
    ]:
        schema = Schema(
            feature=[
                FeatureSpec(
                    name="gone",
                    type=FeatureType.BYTES,
                    presence=Presence(min_count=1),
                    lifecycle_stage=stage,
                )
            ]
        )
        keys = _reason_keys({"present": ["x"]}, schema)
        missing = [k for k in keys if k.startswith("gone_")]
        assert (missing == []) == exempt, (stage, keys)


# --------------------------------------------------------------------------
# multi-index sparse feature goldens
# (sparse_feature_stats_generator_test.py:29-278, schema.cc:1197-1248)
# --------------------------------------------------------------------------
def test_sparse_multi_index_valid_input_golden(spark):
    """sparse_feature_stats_generator_test.py:29-110 (valid_input): two index
    features, everything aligned → all-zero stats for both indexes."""
    from data_validation_spark.stats.sparse import sparse_feature_stats

    df = spark.createDataFrame(
        [(["a"], [1], [2]), (["a", "b"], [1, 3], [2, 4])],
        "value_feature array<string>, index_feature1 array<bigint>, "
        "index_feature2 array<bigint>",
    )
    s = sparse_feature_stats(df, ["index_feature1", "index_feature2"], "value_feature")
    assert s["missing_value"] == 0
    assert s["missing_index_by_index"] == {"index_feature1": 0, "index_feature2": 0}
    assert s["min_length_diff_by_index"] == {"index_feature1": 0, "index_feature2": 0}
    assert s["max_length_diff_by_index"] == {"index_feature1": 0, "index_feature2": 0}


def test_sparse_multi_index_missing_value_and_index_golden(spark):
    """sparse_feature_stats_generator_test.py:112-193: missing_value 2,
    missing index_feature1 in 3 examples, per-index length diffs with null
    lists counting as length 0."""
    from data_validation_spark.stats.sparse import sparse_feature_stats

    rows = [
        (None, [1], [2]),
        (None, [1], [2]),
        (["a", "b"], None, [2, 4]),
        (["a", "b"], None, [2, 4]),
        (["a", "b"], None, [2, 4]),
    ]
    df = spark.createDataFrame(
        rows,
        "value_feature array<string>, index_feature1 array<bigint>, "
        "index_feature2 array<bigint>",
    )
    s = sparse_feature_stats(df, ["index_feature1", "index_feature2"], "value_feature")
    assert s["missing_value"] == 2
    assert s["missing_index_by_index"] == {"index_feature1": 3, "index_feature2": 0}
    assert s["max_length_diff_by_index"] == {"index_feature1": 1, "index_feature2": 1}
    assert s["min_length_diff_by_index"] == {"index_feature1": -2, "index_feature2": 0}


def test_sparse_multi_index_rule_wording_golden(spark):
    """schema.cc:1197-1248 (UpdateSparseFeature): per-index anomalies with
    the exact reference strings, one per nonzero min/max diff stat."""
    from data_validation_spark.stats.sparse import attach_sparse_weighted_stats
    from data_validation_spark.stats.result import DatasetStats, DatasetStatsList

    rows = [
        (None, [1], [2]),
        (None, [1], [2]),
        (["a", "b"], None, [2, 4]),
        (["a", "b"], None, [2, 4]),
        (["a", "b"], None, [2, 4]),
    ]
    df = spark.createDataFrame(
        rows,
        "value_feature array<string>, index_feature1 array<bigint>, "
        "index_feature2 array<bigint>",
    )
    schema = Schema(
        sparse_feature=[
            SparseFeature(
                name="sparse_feature",
                value_feature="value_feature",
                index_features=["index_feature1", "index_feature2"],
            )
        ]
    )
    stats = DatasetStatsList([DatasetStats(num_examples=5)])
    attach_sparse_weighted_stats(stats, df, schema)
    result = validate_statistics(stats, schema)
    descs = sorted(a.description for a in result.anomalies)
    assert descs == [
        "Found 2 examples missing value feature",
        "Found 3 examples missing index feature: index_feature1",
        "Mismatch between index feature: index_feature1 and value column, "
        "with max_length_diff = 1",
        "Mismatch between index feature: index_feature1 and value column, "
        "with min_length_diff = -2",
        "Mismatch between index feature: index_feature2 and value column, "
        "with max_length_diff = 1",
    ]


def test_sparse_component_not_in_batch_golden(spark):
    """sparse_feature_stats_generator_test.py:403-567 (value/index feature
    not in batch): an absent component behaves as always-null — every
    present row counts it missing, and its length is 0 in the diffs."""
    from data_validation_spark.stats.sparse import sparse_feature_stats

    df = spark.createDataFrame(
        [([1],), ([1, 3],)], "index_feature1 array<bigint>"
    )
    s = sparse_feature_stats(df, ["index_feature1"], "value_feature")
    assert s["missing_value"] == 2
    assert s["missing_index_by_index"] == {"index_feature1": 0}
    assert s["min_length_diff_by_index"] == {"index_feature1": 1}
    assert s["max_length_diff_by_index"] == {"index_feature1": 2}

    s2 = sparse_feature_stats(df, ["index_feature1", "ghost_index"], "value_feature")
    assert s2["missing_index_by_index"]["ghost_index"] == 2
    assert s2["max_length_diff_by_index"]["ghost_index"] == 0
