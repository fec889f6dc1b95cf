"""Tests for sources, sparse/weighted stats, empty-value counts, the
partitioned harness, and streaming incremental stats."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.sources import (
    from_example_dicts,
    from_pandas,
    iceberg_available,
    read_csv,
    read_iceberg,
    read_parquet,
)
from data_validation_spark.stats.sparse import (
    empty_value_counts,
    partitioned_stats,
    sparse_feature_stats,
    weighted_feature_stats,
)


def test_read_parquet_with_pruning(spark, sf_dir):
    df = read_parquet(spark, f"{sf_dir}/nation.parquet", columns=["n_name"])
    assert df.columns == ["n_name"]
    assert df.count() == 25


def test_read_csv(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = read_csv(spark, p)
    assert df.count() == 2
    assert dict(df.dtypes)["a"] == "int"


def test_from_pandas_and_dicts(spark):
    import pandas as pd

    assert from_pandas(spark, pd.DataFrame({"x": [1, 2]})).count() == 2
    assert from_example_dicts(spark, [{"x": 1}, {"x": 2}]).count() == 2


def test_iceberg_gated(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg jar present")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_iceberg(spark, "db.tbl")


def test_sparse_feature_stats(spark):
    rows = [
        ([1, 2], [10.0, 20.0]),  # aligned
        ([1, 2, 3], [10.0]),  # length diff +2
        (None, [5.0]),  # missing index
        ([4], None),  # missing value
    ]
    df = spark.createDataFrame(rows, "idx array<int>, val array<double>")
    s = sparse_feature_stats(df, "idx", "val")
    assert s["missing_value"] == 1
    assert s["missing_index"] == 1
    # reference length-diff semantics (constituents/length_diff_generator.py):
    # a null component counts as length 0, so the missing-index row
    # contributes 0-1 = -1 and the missing-value row 1-0 = +1
    assert s["min_length_diff"] == -1
    assert s["max_length_diff"] == 2


def test_weighted_feature_stats(spark):
    rows = [(["a"], [1.0]), (["a", "b"], [1.0]), (None, [1.0]), (["c"], None)]
    df = spark.createDataFrame(rows, "val array<string>, wt array<double>")
    s = weighted_feature_stats(df, "val", "wt")
    assert s["missing_value"] == 1
    assert s["missing_weight"] == 1
    assert s["min_weight_length_diff"] == -1
    assert s["max_weight_length_diff"] == 0


def test_empty_value_counts(spark):
    rows = [(-1, "", []), (5, "x", [1]), (-1, None, None)]
    df = spark.createDataFrame(rows, "i long, s string, a array<int>")
    out = empty_value_counts(df)
    assert out == {"i": 2, "s": 1, "a": 1}


def test_partitioned_stats(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "x double")
    out = partitioned_stats(df, lambda pdf: {"mean_x": float(pdf["x"].mean())}, 5)
    s = out["mean_x"]
    assert s["num_partitions"] == 5
    assert s["mean"] == pytest.approx(499.5, abs=30)
    assert s["min"] <= s["median"] <= s["max"]


def test_partitioned_stats_min_presence(spark):
    # get_valid_statistics parity: a stat reported by fewer than
    # min_partitions_stat_presence partitions is dropped from the summary.
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "x double")

    def fn(pdf):
        stats = {"always": float(pdf["x"].mean())}
        if (pdf["x"] == 0.0).any():  # exactly one partition holds row 0
            stats["rare"] = 1.0
        return stats

    out = partitioned_stats(df, fn, 5, min_partitions_stat_presence=2)
    assert "always" in out and out["always"]["num_partitions"] == 5
    assert "rare" not in out
    out = partitioned_stats(df, fn, 5, min_partitions_stat_presence=1)
    assert out["rare"]["num_partitions"] == 1


def test_streaming_incremental_stats(spark, tmp_path):
    from data_validation_spark.streaming import StreamingStatsCollector

    src = str(tmp_path / "stream_src")
    df1 = spark.createDataFrame([(1.0, "a"), (2.0, "b")], "x double, s string")
    df2 = spark.createDataFrame([(3.0, "a"), (4.0, "c")], "x double, s string")
    df1.write.mode("overwrite").parquet(src)

    collector = StreamingStatsCollector()
    stream = spark.readStream.schema("x double, s string").parquet(src)
    q = collector.attach(stream)
    try:
        q.processAllAvailable()
        df2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    acc = collector.accumulated.default_slice()
    assert acc.num_examples == 4
    assert acc.feature("x").numeric.min == 1.0
    assert acc.feature("x").numeric.max == 4.0
    assert acc.feature("x").numeric.mean == pytest.approx(2.5)
    assert acc.feature("s").string.value_counts()["a"] == 2.0


def test_streaming_windowed_counts(spark, tmp_path):
    from data_validation_spark.streaming import windowed_event_counts

    src = str(tmp_path / "events_src")
    rows = [
        ("2024-01-01 00:01:00", "click", 1.0),
        ("2024-01-01 00:02:00", "click", 2.0),
        ("2024-01-01 00:07:00", "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts_s string, k string, v double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k", "v"
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("ts timestamp, k string, v double").parquet(src)
    agg = windowed_event_counts(stream, "ts", "k", window="5 minutes", value_col="v")
    q = agg.writeStream.outputMode("complete").format("memory").queryName("wc").start()
    try:
        q.processAllAvailable()
        out = {(r["k"], r["w"]["start"].minute): r["n"] for r in spark.sql("select * from wc").collect()}
    finally:
        q.stop()
    assert out[("click", 0)] == 2
    assert out[("view", 5)] == 1


def test_streaming_dedup_first_seen(spark, tmp_path):
    from data_validation_spark.streaming import streaming_dedup_first_seen

    src = str(tmp_path / "dedup_src")
    rows = [
        ("2024-01-01 00:01:00", "a"),
        ("2024-01-01 00:02:00", "a"),  # duplicate within batch
        ("2024-01-01 00:03:00", "b"),
    ]
    df = spark.createDataFrame(rows, "ts_s string, k string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k"
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("ts timestamp, k string").parquet(src)
    out = streaming_dedup_first_seen(stream, "k", "ts")
    q = out.writeStream.outputMode("append").format("memory").queryName("dd").start()
    try:
        q.processAllAvailable()
        # a cross-batch duplicate + one new key
        df2 = spark.createDataFrame(
            [("2024-01-01 00:04:00", "a"), ("2024-01-01 00:05:00", "c")],
            "ts_s string, k string",
        ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k")
        df2.write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r["key"]: r["first_ts"].minute for r in spark.sql("select * from dd").collect()}
    finally:
        q.stop()
    assert got == {"a": 1, "b": 3, "c": 5}  # 'a' emitted once, at first sight


def test_streaming_sessionize(spark, tmp_path):
    from data_validation_spark.streaming import streaming_sessionize

    src = str(tmp_path / "sess_src")
    rows = [
        ("2024-01-01 00:00:00", "u1"),
        ("2024-01-01 00:10:00", "u1"),
        ("2024-01-01 02:00:00", "u1"),  # > 30 min gap → first session closes
        ("2024-01-01 00:05:00", "u2"),
    ]
    df = spark.createDataFrame(rows, "ts_s string, u string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "u"
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("ts timestamp, u string").parquet(src)
    out = streaming_sessionize(stream, "u", "ts", gap_minutes=30, watermark="1 hour")
    q = out.writeStream.outputMode("append").format("memory").queryName("ss").start()

    def sink():
        if q.exception():
            raise AssertionError(str(q.exception()))
        return sorted(
            (r["user"], r["session_start"].hour, r["session_start"].minute,
             r["session_end"].minute, r["n_events"])
            for r in spark.sql("select * from ss").collect()
        )

    try:
        q.processAllAvailable()
        # The completed u1 session (00:00-00:10, 2 events) splits in-batch.
        # After batch 1 the watermark reaches 01:00 (max 02:00 − 1h) and the
        # event-time timeout batch closes u2 (@00:05, timeout 00:35 < wm) —
        # no wall-clock involved. u1's open session (@02:00, timeout 02:30)
        # stays in state.
        assert sink() == [("u1", 0, 0, 10, 2), ("u2", 0, 5, 5, 1)]

        # EventTimeTimeout: advancing the WATERMARK (not the wall clock)
        # closes the remaining session: data at 05:00 → wm 04:00 > 02:30.
        late = spark.createDataFrame([("2024-01-01 05:00:00", "u3")], "ts_s string, u string")
        late.select(F.col("ts_s").cast("timestamp").alias("ts"), "u").write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = sink()
    finally:
        q.stop()
    assert ("u1", 2, 0, 0, 1) in got  # u1 @02:00 closed by watermark advance


def test_streaming_drift_monitor_fixed_reference(spark, tmp_path):
    # Training-vs-serving drift monitoring over a stream: each micro-batch
    # drifts against a FIXED reference artifact; a distribution flip fires
    # COMPARATOR_L_INFTY_HIGH on that batch only.
    from data_validation_spark.anomalies import AnomalyType as AT
    from data_validation_spark.schema import (
        DriftComparator,
        FeatureSpec,
        FeatureType,
        Schema,
    )
    from data_validation_spark.stats.engine import compute_statistics
    from data_validation_spark.streaming import StreamingStatsCollector

    ref_df = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "s string")
    reference = compute_statistics(ref_df)
    schema = Schema(feature=[FeatureSpec(
        name="s", type=FeatureType.BYTES,
        drift_comparator=DriftComparator(infinity_norm_threshold=0.3),
    )])

    seen = {}
    collector = StreamingStatsCollector(
        schema=schema,
        reference_statistics=reference,
        on_anomalies=lambda epoch, a: seen.setdefault(epoch, a),
    )
    src = str(tmp_path / "drift_src")
    # batch 0 matches the reference mix; batch 1 is flipped. Each write is
    # coalesced to ONE part file: the running query polls continuously, and
    # a multi-file append can straddle a poll boundary and split into two
    # micro-batches (flaked under suite load); a single file commits via an
    # atomic rename, so each write is exactly one non-empty epoch.
    spark.createDataFrame([("a",)] * 4 + [("b",)] * 1, "s string").coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("s string").parquet(src)
    q = collector.attach(stream)
    try:
        q.processAllAvailable()
        spark.createDataFrame([("b",)] * 9 + [("a",)] * 1, "s string").coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen) == 2
    epochs = sorted(seen)
    assert AT.COMPARATOR_L_INFTY_HIGH not in seen[epochs[0]].types_for("s")
    assert AT.COMPARATOR_L_INFTY_HIGH in seen[epochs[1]].types_for("s")
    # drift measured against the fixed reference, not the running artifact
    m = [x for x in seen[epochs[1]].drift_skew_info if x.feature == "s"][0]
    assert m.value == pytest.approx(0.7, abs=0.01)  # |0.9 - 0.2| on label b
