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
        reference_statistics: Optional[DatasetStatsList] = None,
    ):
        self.options = options or StatsOptions()
        self.schema = schema
        self.on_anomalies = on_anomalies
        # Fixed drift baseline (training-vs-serving monitoring shape): when
        # set, every micro-batch drifts against THIS artifact; otherwise
        # against the running accumulated artifact (self-drift detection).
        self.reference_statistics = reference_statistics
        self.accumulated: Optional[DatasetStatsList] = None
        self.batches_seen = 0

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = compute_statistics(batch_df, self.options)
        if self.schema is not None:
            anomalies = validate_statistics(
                stats,
                self.schema,
                previous_statistics=self.reference_statistics or self.accumulated,
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


# ------------------------------------------------- custom stateful operators
def streaming_dedup_first_seen(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    state_ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Stateful exact streaming dedup: emit each key's FIRST occurrence only.

    ``applyInPandasWithState`` keeps one boolean per key; late duplicates are
    suppressed across micro-batches (unlike ``dropDuplicates`` within a batch
    alone). With ``state_ttl_minutes`` the key's state expires via processing-
    time timeout, bounding state size — the standard at-scale trade: exact
    dedup within the TTL horizon, re-admittance after.

    Output: (key, first_ts, n_dups_suppressed_so_far emitted at first sight=0).
    """
    import pandas as pd  # noqa: F401  (used inside the worker closure)

    out_schema = "key string, first_ts timestamp"
    state_schema = "seen boolean"
    timeout = "ProcessingTimeTimeout" if state_ttl_minutes else "NoTimeout"

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdf_iter:
            if not state.exists and len(pdf):
                m = pdf[ts_col].min()
                first = m if first is None else min(first, m)
        if not state.exists and first is not None:
            state.update((True,))
            if state_ttl_minutes:
                state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
            import pandas as pd

            yield pd.DataFrame({"key": [key[0]], "first_ts": [first]})

    src = stream_df.withWatermark(ts_col, watermark).select(
        F.col(key_col).cast("string").alias("k"), F.col(ts_col).alias(ts_col)
    )
    return src.groupBy("k").applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_sessionize(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming sessionization: per-user sessions closed after
    ``gap_minutes`` of event-time silence, expired by the WATERMARK
    (EventTimeTimeout), so late-data handling is event-time-deterministic —
    a session closes exactly when the watermark passes last_ts + gap, never
    on a wall clock.

    State per user: (session_start, last_ts, n_events). Each batch folds its
    (sorted) events into the open session, splitting when the gap exceeds the
    threshold; completed sessions are emitted immediately, the open one when
    the event-time timeout fires. This is the ``applyInPandasWithState``
    shape the batch ``sessionization`` query mirrors (lag + cumulative sum),
    kept incremental here so 10^12-row streams never re-scan history.

    Output: (user, session_start, session_end, n_events).
    """
    out_schema = "user string, session_start timestamp, session_end timestamp, n_events long"
    state_schema = "session_start timestamp, last_ts timestamp, n_events long"
    gap_s = gap_minutes * 60

    def fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user": [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )
            return
        ts_all = []
        for pdf in pdf_iter:
            ts_all.append(pdf[ts_col])
        if not ts_all:
            return
        ts = pd.concat(ts_all).sort_values().reset_index(drop=True)
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts.iloc[0], ts.iloc[0], 0
        done_rows = []
        for t in ts:
            if (t - last).total_seconds() > gap_s:
                done_rows.append((key[0], start, last, n))
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        # Event-time expiry: fire when the watermark passes last + gap. The
        # timestamp must sit strictly above the current watermark, so clamp
        # (a fully-late session expires on the very next batch).
        timeout_ms = int(pd.Timestamp(last).value // 1_000_000) + gap_s * 1000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if done_rows:
            yield pd.DataFrame(
                done_rows, columns=["user", "session_start", "session_end", "n_events"]
            )

    src = stream_df.withWatermark(ts_col, watermark).select(
        F.col(user_col).cast("string").alias("u"), F.col(ts_col).alias(ts_col)
    )
    return src.groupBy("u").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )
