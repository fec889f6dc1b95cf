"""Per-example validation — TFDV's ``validate_instance``
(``api/validation_api.py:549-606``): build single-row statistics in memory,
validate against the schema, and strip anomaly types that only make sense on
full datasets. Plus dataset-level helpers that slice anomalous rows by reason.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, functions as F

from data_validation_spark.anomalies import Anomalies, GLOBAL_ONLY_ANOMALY_TYPES
from data_validation_spark.schema import Schema
from data_validation_spark.stats.result import (
    CommonStats,
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
    NumericStats,
    RankBucket,
    StringStats,
)
from data_validation_spark.validate.rules import validate_statistics


def _stats_for_value(name: str, value: Any) -> FeatureStats:
    if isinstance(value, (list, tuple)):
        values = [v for v in value if v is not None]
        nest = 1
    else:
        values = [value] if value is not None else []
        nest = 0
    fs = FeatureStats(name=name, type="UNKNOWN")
    n = len(values)
    fs.common = CommonStats(
        num_non_missing=1 if (value is not None) else 0,
        num_missing=0 if (value is not None) else 1,
        min_num_values=n if value is not None else 0,
        max_num_values=n if value is not None else 0,
        avg_num_values=float(n),
        tot_num_values=n,
    )
    if not values:
        return fs
    v0 = values[0]
    if isinstance(v0, bool) or isinstance(v0, int):
        fs.type = "INT"
    elif isinstance(v0, float):
        fs.type = "FLOAT"
    elif isinstance(v0, (bytes, bytearray)):
        fs.type = "BYTES"
    else:
        fs.type = "STRING"
    if fs.type in ("INT", "FLOAT"):
        import math

        nums = [float(v) for v in values]
        finite = [x for x in nums if math.isfinite(x)]
        fs.numeric = NumericStats(
            mean=sum(finite) / len(finite) if finite else 0.0,
            min=min((x for x in nums if not math.isnan(x)), default=0.0),
            max=max((x for x in nums if not math.isnan(x)), default=0.0),
            num_zeros=sum(1 for x in nums if x == 0),
            num_nan=sum(1 for x in nums if math.isnan(x)),
            num_pos_inf=sum(1 for x in nums if x == math.inf),
            num_neg_inf=sum(1 for x in nums if x == -math.inf),
        )
        fs.numeric.finite_min = min(finite, default=None)
        fs.numeric.finite_max = max(finite, default=None)
    if fs.type == "STRING":
        counts: dict[str, int] = {}
        for v in values:
            counts[str(v)] = counts.get(str(v), 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        fs.string = StringStats(
            unique=len(counts),
            top_values=[(v, float(c)) for v, c in ranked],
            avg_length=sum(len(str(v)) for v in values) / len(values),
            rank_histogram=[
                RankBucket(i + 1, i + 1, v, float(c)) for i, (v, c) in enumerate(ranked)
            ],
        )
    return fs


def statistics_for_instance(instance: dict[str, Any]) -> DatasetStatsList:
    """Single-example statistics artifact (generate_statistics_in_memory role)."""
    ds = DatasetStats(num_examples=1)
    for name, value in instance.items():
        ds.features[name] = _stats_for_value(name, value)
    return DatasetStatsList([ds])


def validate_instance(
    instance: dict[str, Any], schema: Schema, environment: Optional[str] = None
) -> Anomalies:
    """Validate one example; global-only anomaly types are stripped
    (reference validation_api.py:41-57)."""
    stats = statistics_for_instance(instance)
    result = validate_statistics(stats, schema, environment=environment)
    result.anomalies = [
        a for a in result.anomalies if a.type not in GLOBAL_ONLY_ANOMALY_TYPES
    ]
    return result


def slice_by_anomaly_reason(
    df: DataFrame, violations: DataFrame, key_col: str
) -> DataFrame:
    """Re-key rows by the anomaly reason(s) they triggered — the reference's
    anomaly-reason slicer (``IdentifyAnomalousExamples``): join violation rows
    back to the data; downstream stats can slice on ``anomaly_reason``."""
    v = violations.select(
        F.col("row_key"), F.col("anomaly_type").alias("anomaly_reason")
    ).dropDuplicates()
    return df.join(v, df[key_col].cast("string") == v["row_key"], "inner").drop("row_key")


def with_derived_features(df: DataFrame, derived: dict[str, "F.Column"]) -> DataFrame:
    """Schema-configured derived features added before the stats pass
    (reference preprocessing_util.add_derived_features role)."""
    for name, col in derived.items():
        df = df.withColumn(name, col)
    return df


def mark_derived_features(stats, sources: dict[str, str]) -> None:
    """Stamp the ``validation_derived_source`` custom stat on derived features
    (the statistics-side half of ``schema.cc:1171-1194``): feature name →
    source feature it was derived from. ``validate_statistics`` then checks
    the schema carries the source + VALIDATION_DERIVED lifecycle."""
    for sl in stats.slices:
        for name, src in sources.items():
            fs = sl.features.get(name)
            if fs is not None:
                fs.custom["validation_derived_source"] = src
