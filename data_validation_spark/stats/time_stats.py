"""Time-semantic statistics — analogue of the reference's time stats
generator (``time_stats_generator.py``): detect whether a string column holds
date/time-formatted values (regex try-match over a fixed format menu) or an
int column holds plausible Unix timestamps; report the most common matching
format and the match fraction; infer a time domain at ≥80% over ≥100 values.

All format matching is JVM-side (``regexp_like`` / ``to_timestamp`` try-casts).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from data_validation_spark.stats.result import DatasetStatsList

MATCH_FRACTION = 0.8
MIN_EXAMPLES = 100

# (format label, regex) — menu mirrors the reference's common formats
STRING_FORMATS = [
    ("%Y-%m-%d", r"^\d{4}-\d{2}-\d{2}$"),
    ("%Y/%m/%d", r"^\d{4}/\d{2}/\d{2}$"),
    ("%d/%m/%Y", r"^\d{2}/\d{2}/\d{4}$"),
    ("%Y-%m-%dT%H:%M:%S", r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"),
    ("%Y-%m-%d %H:%M:%S", r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"),
    ("%H:%M:%S", r"^\d{2}:\d{2}:\d{2}$"),
]

# Unix-time integer ranges (the reference checks seconds/millis windows)
UNIX_RANGES = [
    ("UNIX_SECONDS", 10**8, 10**11),
    ("UNIX_MILLISECONDS", 10**11, 10**14),
    ("UNIX_MICROSECONDS", 10**14, 10**17),
]


def time_match_stats(df: DataFrame, col: str) -> dict:
    """{format → match count} + considered count, one aggregation pass."""
    dtype = dict(df.dtypes).get(col)
    c = F.col(col)
    aggs = [F.count(c).alias("considered")]
    if dtype in ("string",):
        for label, rx in STRING_FORMATS:
            aggs.append(
                F.sum(F.when(c.rlike(rx), 1).otherwise(0)).alias(f"fmt::{label}")
            )
    else:
        for label, lo, hi in UNIX_RANGES:
            aggs.append(
                F.sum(F.when((c >= lo) & (c < hi), 1).otherwise(0)).alias(f"fmt::{label}")
            )
    row = df.agg(*aggs).collect()[0].asDict()
    considered = int(row.pop("considered") or 0)
    counts = {k.split("::", 1)[1]: int(v or 0) for k, v in row.items() if v}
    return {"considered": considered, "formats": counts}


def attach_time_stats(stats: DatasetStatsList, df: DataFrame, col: str) -> DatasetStatsList:
    info = time_match_stats(df, col)
    considered = info["considered"]
    formats = info["formats"]
    best = max(formats.items(), key=lambda kv: kv[1]) if formats else (None, 0)
    frac = best[1] / considered if considered else 0.0
    for sl in stats.slices:
        fs = sl.features.get(col)
        if fs is None:
            continue
        if best[0] is not None:
            fs.custom["time_format"] = best[0]
            fs.custom["time_match_fraction"] = frac
        if considered >= MIN_EXAMPLES and frac >= MATCH_FRACTION:
            fs.custom["domain_info"] = f"time_domain {{format: {best[0]}}}"
    return stats
