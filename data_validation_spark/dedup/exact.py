"""Exact deduplication via hash-groupBy — content fingerprints (md5/xxhash64)
grouped, duplicate groups reported, one representative kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def duplicate_groups(df: DataFrame, content_cols: list[str] | str) -> DataFrame:
    """(fingerprint, dup_count, example_ids?) for groups with > 1 row."""
    if isinstance(content_cols, str):
        content_cols = [content_cols]
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    return (
        df.select(fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def drop_exact_duplicates(df: DataFrame, content_cols: list[str] | str,
                          order_col: str | None = None) -> DataFrame:
    """Keep one row per content fingerprint; deterministic winner when
    ``order_col`` given (lowest value wins), else dropDuplicates."""
    if isinstance(content_cols, str):
        content_cols = [content_cols]
    if order_col is None:
        return df.dropDuplicates(content_cols)
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    w = Window.partitionBy(fp).orderBy(F.col(order_col))
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
