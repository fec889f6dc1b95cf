"""display.py — schema/anomalies/stats rendering parity with the reference's
display_util (get_schema_dataframe:63-208, get_anomalies_dataframe:224-287,
get_drift_skew_dataframe:289-305)."""

import numpy as np
import pytest

from data_validation_spark.display import (
    display_anomalies,
    display_schema,
    display_statistics,
    get_anomalies_dataframe,
    get_drift_skew_dataframe,
    get_schema_dataframe,
    get_statistics_dataframe,
)
from data_validation_spark.schema import (
    DriftComparator,
    FeatureSpec,
    FeatureType,
    FloatDomain,
    IntDomain,
    Presence,
    Schema,
    StringDomain,
    ValueCount,
)


def _schema():
    return Schema(
        string_domain=[StringDomain(name="shared_enum", value=["a", "b"])],
        feature=[
            FeatureSpec(
                name="req",
                type=FeatureType.BYTES,
                presence=Presence(min_count=1, min_fraction=1.0),
                value_count=ValueCount(min=1, max=1),
                domain="shared_enum",
            ),
            FeatureSpec(
                name="opt_int",
                type=FeatureType.INT,
                presence=Presence(min_count=1, min_fraction=0.5),
                value_count=ValueCount(min=0, max=None),
                int_domain=IntDomain(min=0, max=10),
            ),
            FeatureSpec(
                name="flt",
                type=FeatureType.FLOAT,
                float_domain=FloatDomain(min=0.0, disallow_inf=True),
            ),
            FeatureSpec(
                name="inline_enum",
                type=FeatureType.BYTES,
                string_domain=StringDomain(name="", value=["x", "y"]),
            ),
        ],
    )


def test_schema_dataframe_reference_shapes():
    features, domains = get_schema_dataframe(_schema())
    assert list(features.columns) == ["Type", "Presence", "Valency", "Domain"]
    assert features.index.name == "Feature name"
    req = features.loc["'req'"]
    # BYTES with a domain renders as STRING (reference :126-130)
    assert req["Type"] == "STRING"
    assert req["Presence"] == "required"
    assert req["Valency"] == "single"
    assert req["Domain"] == "'shared_enum'"
    opt = features.loc["'opt_int'"]
    assert opt["Presence"] == "optional"
    assert opt["Valency"] == "[0,inf)"
    assert opt["Domain"] == "min: 0; max: 10"
    # disallow_inf suppresses the implied infinite bound (reference :142-151)
    assert features.loc["'flt'"]["Domain"] == "min: 0.000000"
    # inline string_domain named <feature>_domain (reference :153-163)
    assert features.loc["'inline_enum'"]["Domain"] == "'inline_enum_domain'"
    assert set(domains.index) == {"'shared_enum'", "'inline_enum_domain'"}
    assert domains.loc["'shared_enum'"]["Values"] == "'a', 'b'"


def test_anomalies_dataframe_and_markdown():
    from data_validation_spark.stats.result import (
        CommonStats,
        DatasetStats,
        DatasetStatsList,
        FeatureStats,
        NumericStats,
    )
    from data_validation_spark.validate.rules import validate_statistics

    fs = FeatureStats(name="opt_int", type="INT")
    fs.common = CommonStats(num_non_missing=4, tot_num_values=4,
                            min_num_values=1, max_num_values=1, avg_num_values=1.0)
    fs.numeric = NumericStats(min=-5, max=3)
    ds = DatasetStats(num_examples=4)
    ds.features["opt_int"] = fs
    result = validate_statistics(DatasetStatsList([ds]), _schema())
    df = get_anomalies_dataframe(result)
    assert list(df.columns) == [
        "Anomaly short description",
        "Anomaly long description",
        "Anomaly types",
    ]
    assert "'opt_int'" in df.index
    assert "INT_TYPE_SMALL_INT" in df.loc["'opt_int'"]["Anomaly types"]
    md = display_anomalies(result)
    assert "opt_int" in md

    # clean result renders the reference's no-anomaly message
    clean = validate_statistics(DatasetStatsList([ds]), Schema(feature=[
        FeatureSpec(name="opt_int", type=FeatureType.INT)]))
    assert display_anomalies(clean) == "No anomalies found."


def test_drift_skew_dataframe():
    from data_validation_spark.stats.result import DatasetStatsList
    from data_validation_spark.validate.rules import validate_statistics
    from tests.test_validate_goldens import _int_hist_feature, stats_of

    schema = Schema(feature=[FeatureSpec(
        name="x", type=FeatureType.INT,
        drift_comparator=DriftComparator(jensen_shannon_divergence_threshold=0.5),
    )])
    hist = [(1.0, 2.0, 1.0), (2.0, 3.0, 1.0)]
    cur = stats_of([_int_hist_feature("x", hist)], num_examples=2)
    prev = stats_of([_int_hist_feature("x", hist)], num_examples=2)
    r = validate_statistics(cur, schema, previous_statistics=prev)
    df = get_drift_skew_dataframe(r)
    assert list(df.columns) == ["type", "value", "threshold"]
    assert df.loc["x"]["type"] == "JENSEN_SHANNON_DIVERGENCE"
    assert df.loc["x"]["value"] == pytest.approx(0.0)


def test_statistics_dataframe_and_markdown(spark):
    from data_validation_spark.stats.engine import compute_statistics

    df = spark.createDataFrame(
        [(float(i % 5), f"k{i % 3}") for i in range(100)], "x double, s string"
    )
    stats = compute_statistics(df)
    sdf = get_statistics_dataframe(stats)
    assert set(sdf["feature"]) == {"x", "s"}
    assert (sdf["num_non_missing"] == 100).all()
    md = display_statistics(stats, max_rows=1)
    assert "more rows" in md


def test_anomalies_json_roundtrip_and_remove_types():
    # reference anomalies_util parity: load/store + remove_anomaly_types
    from data_validation_spark.anomalies import (
        Anomalies,
        Anomaly,
        AnomalyType as AT,
        DriftSkewMeasurement,
        Severity,
    )

    r = Anomalies(
        anomalies=[
            Anomaly("f1", AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES,
                    description="bad enum", measurement=0.3, threshold=0.1),
            Anomaly("f1", AT.COMPARATOR_L_INFTY_HIGH, description="drifty"),
            Anomaly("f2", AT.SCHEMA_NEW_COLUMN, severity=Severity.WARNING),
        ],
        drift_skew_info=[DriftSkewMeasurement("f1", "L_INFTY", 0.3, 0.1)],
    )
    back = Anomalies.from_json(r.to_json())
    assert [a.to_dict() for a in back.anomalies] == [a.to_dict() for a in r.anomalies]
    assert back.drift_skew_info == r.drift_skew_info
    assert back.feature_anomaly_info()["f1"]["short_description"] == "Multiple errors"

    filtered = r.remove_anomaly_types({AT.COMPARATOR_L_INFTY_HIGH, AT.SCHEMA_NEW_COLUMN})
    assert set(filtered.types_for("f1")) == {AT.ENUM_TYPE_UNEXPECTED_STRING_VALUES}
    assert "f2" not in filtered.feature_anomaly_info()  # all reasons removed → dropped
    # roll-up self-updates: f1 back to a single-reason info
    assert filtered.feature_anomaly_info()["f1"]["description"] == "bad enum"
    assert filtered.drift_skew_info == r.drift_skew_info
