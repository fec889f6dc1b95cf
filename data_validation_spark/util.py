"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, minimum: int | None = None) -> DataFrame:
    """Repartition only when the input is under-split for the cluster.

    Arrow-batched passes (minhash signatures, simhash fingerprints, language
    ID) parallelize per input partition; a single-row-group parquet file scans
    as ONE task and serializes the whole pass. At real cluster scale inputs
    have plentiful splits and this is a no-op; locally it costs one narrow
    shuffle of the projected columns and buys full-core parallelism.
    """
    sc = df.sparkSession.sparkContext
    minimum = minimum or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= minimum:
        return df
    return df.repartition(minimum)
