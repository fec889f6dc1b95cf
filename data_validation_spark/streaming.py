"""Streaming statistics & validation — a Spark-native extension beyond the
reference (TFDV is strictly batch; its temporal story is cross-dataset span
comparison). Two shapes:

* ``StreamingStatsCollector`` — ``foreachBatch`` incremental profiling: each
  micro-batch is profiled with the batch engine and tree-merged into a running
  artifact (``io.artifacts.merge_stats``), with optional per-batch validation
  + drift vs the previous accumulated artifact. Exactly-once per epoch via the
  foreachBatch contract.
* ``windowed_event_counts`` — watermarked tumbling-window counts per key, the
  canonical late-data-tolerant aggregation.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F

from data_validation_spark.anomalies import Anomalies
from data_validation_spark.io.artifacts import merge_stats
from data_validation_spark.schema import Schema
from data_validation_spark.stats.engine import compute_statistics
from data_validation_spark.stats.options import StatsOptions
from data_validation_spark.stats.result import DatasetStatsList
from data_validation_spark.validate.rules import validate_statistics


class StreamingStatsCollector:
    """Accumulates statistics over a stream via foreachBatch."""

    def __init__(
        self,
        options: Optional[StatsOptions] = None,
        schema: Optional[Schema] = None,
        on_anomalies: Optional[Callable[[int, Anomalies], None]] = None,
    ):
        self.options = options or StatsOptions()
        self.schema = schema
        self.on_anomalies = on_anomalies
        self.accumulated: Optional[DatasetStatsList] = None
        self.batches_seen = 0

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = compute_statistics(batch_df, self.options)
        if self.schema is not None:
            anomalies = validate_statistics(
                stats, self.schema, previous_statistics=self.accumulated
            )
            if self.on_anomalies is not None:
                self.on_anomalies(epoch_id, anomalies)
        self.accumulated = (
            stats if self.accumulated is None else merge_stats([self.accumulated, stats])
        )
        self.batches_seen += 1

    def attach(self, stream_df: DataFrame, **start_kwargs):
        """Start the stream with this collector as the sink."""
        return (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .start(**start_kwargs)
        )


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: Optional[str] = None,
) -> DataFrame:
    """Watermarked tumbling-window counts (+ optional sum) per key."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(*aggs)
    )
