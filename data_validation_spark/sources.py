"""Sources & sinks (SURVEY.md §2.1 parity).

The reference reads TFRecord/CSV/pandas/example-dicts into Arrow RecordBatches;
the Spark-native equivalents are thin wrappers over ``spark.read`` — Catalyst
handles batching, pushdown, and column pruning. Iceberg needs its runtime jar
on the classpath, so the connector is gated behind a capability check.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str, columns: Optional[list[str]] = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    schema: Optional[str] = None,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source with type inference — the reference's csv_decoder role
    (type inference delegated to Spark's reader)."""
    reader = spark.read.option("header", header).option("delimiter", delimiter)
    if schema:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def from_pandas(spark: SparkSession, pdf, schema=None) -> DataFrame:
    """pandas → DataFrame (Arrow path) — stats_gen_lib DataFrame source role."""
    return spark.createDataFrame(pdf, schema=schema)


def from_example_dicts(spark: SparkSession, examples: list[dict], schema=None) -> DataFrame:
    """Legacy example-dict batcher role (batch_util.py) — rows of plain dicts."""
    return spark.createDataFrame(examples, schema=schema)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: Optional[int] = None,
    as_of_timestamp: Optional[int] = None,
) -> DataFrame:
    """Iceberg table source (time-travel capable).

    Prefers the iceberg-spark-runtime jar when present (full spec coverage:
    merge-on-read, ORC, hidden metadata columns). When the jar is absent —
    as in this image — and ``table`` is a filesystem path to an Iceberg
    table, falls back to the native planner
    (:mod:`data_validation_spark.io.iceberg_native`): pure-Python metadata +
    Avro manifest parsing, snapshot selection, and manifest-level partition
    pruning feeding one ``spark.read.parquet`` over the planned files.
    """
    if iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", as_of_timestamp)
        return reader.load(table)
    from data_validation_spark.io import iceberg_native as _ice

    if _ice.is_iceberg_table(table):
        return _ice.read_table(
            spark, table, snapshot_id=snapshot_id, as_of_timestamp=as_of_timestamp
        )
    raise RuntimeError(
        "Iceberg runtime not on the classpath and the given table is not a "
        "filesystem Iceberg table path. Add "
        "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages for "
        "catalog tables, or pass a path with a metadata/ directory for the "
        "native reader."
    )


def iceberg_partitions(spark: SparkSession, table: str) -> list[str]:
    """Partition values for the checkpoint ledger (metadata-only read —
    metadata table via the runtime jar, manifests via the native planner)."""
    if iceberg_available(spark):
        rows = spark.read.format("iceberg").load(f"{table}.partitions").collect()
        return [str(r["partition"]) for r in rows]
    from data_validation_spark.io import iceberg_native as _ice

    return [_ice.partition_key(p) for p in _ice.table_partitions(table)]


def write_violations(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Violation-rows sink (skew-results sink role)."""
    df.write.mode(mode).parquet(path)


# ------------------------------------------------------- bucketed co-location
def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed + sorted on ``bucket_col``.

    The 100 TB posture for repeated referential/equality checks against a
    parent table too big to broadcast: bucket BOTH sides once on the join key
    and every subsequent join is a zero-shuffle sort-merge join (each bucket
    pair joins locally). One-time bucketed write cost, amortized across every
    validation run that joins on the key. Plan-asserted in
    tests/test_plans.py::test_bucketed_join_has_no_exchange.
    """
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def check_referential_bucketed(
    spark: SparkSession, child_table: str, child_key: str,
    parent_table: str, parent_key: str,
) -> DataFrame:
    """Referential orphan check over two pre-bucketed tables — the join keys
    are co-located, so no exchange is needed on either side."""
    child = spark.table(child_table)
    parent = spark.table(parent_table).select(F.col(parent_key).alias("__pk"))
    orphans = child.join(
        parent, on=child[child_key] == parent["__pk"], how="left_anti"
    )
    return orphans.select(
        F.col(child_key).cast("string").alias("row_key"),
        F.lit(child_key).alias("feature"),
        F.lit("REFERENTIAL_ORPHAN").alias("anomaly_type"),
        F.lit("no matching parent key").alias("detail"),
    )
