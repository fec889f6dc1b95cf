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

# ---- format menu: full port of the reference's strptime→regex machinery
# (time_stats_generator.py:91-190). Each strptime directive maps to the same
# regex fragment; the menu is date-only ∪ time-only ∪ explicit combined ∪
# every (date, delimiter∈{T, space}, time) combination — 123 formats.
import calendar as _calendar
import re as _re

_STRPTIME_TO_RE = {
    "%a": r"(?:" + r"|".join(_calendar.day_abbr) + ")",
    "%b": r"(?:" + r"|".join(_calendar.month_abbr[1:]) + ")",
    "%B": r"(?:" + r"|".join(_calendar.month_name[1:]) + ")",
    "%f": r"(?:[0-9]{1,6})",
    "%d": r"(?:3[0-1]|[1-2]\d|0[1-9]|[1-9]| [1-9])",
    "%H": r"(?:2[0-3]|[0-1]\d|\d)",
    "%y": r"(?:\d\d)",
    "%Y": r"(?:\d\d\d\d)",
    "%m": r"(?:1[0-2]|0[1-9]|[1-9])",
    "%M": r"(?:[0-5]\d|\d)",
    # leap (60) and double-leap (61) seconds, reference quirk included
    "%S": r"(?:60[0-1]|[0-5]\d|\d)",
}

_TIME_DELIMITERS = ["T", " "]

_DATE_ONLY_FORMATS = [
    "%Y-%m-%d", "%Y/%m/%d", "%Y%m%d", "%y-%m-%d", "%y/%m/%d",
    "%m-%d-%Y", "%m/%d/%Y", "%m%d%Y", "%m-%d-%y", "%m/%d/%y",
    "%d-%m-%Y", "%d/%m/%Y", "%d%m%Y", "%d-%B-%Y", "%d-%m-%y",
    "%d/%m/%y", "%d-%B-%y",
]

_TIME_ONLY_FORMATS = ["%H:%M", "%H:%M:%S", "%H:%M:%S.%f"]

_COMBINED_FORMATS = ["%a %b %d %H:%M:%S %Y"]


def _strptime_to_regex(fmt: str) -> str:
    directives = _re.compile("|".join(_re.escape(k) for k in _STRPTIME_TO_RE))
    return directives.sub(lambda m: _STRPTIME_TO_RE[m.group(0)], fmt)


def _build_string_formats() -> list[tuple[str, str]]:
    fmts = list(_DATE_ONLY_FORMATS) + list(_TIME_ONLY_FORMATS) + list(_COMBINED_FORMATS)
    for d in _DATE_ONLY_FORMATS:
        for t in _TIME_ONLY_FORMATS:
            for delim in _TIME_DELIMITERS:
                fmts.append(d + delim + t)
    # anchored full-match, like the reference's re.fullmatch
    return [(f, "^" + _strptime_to_regex(f) + "$") for f in fmts]


STRING_FORMATS = _build_string_formats()

# Unix-time integer windows — exact reference bounds (1990-01-01..2030-01-01,
# time_stats_generator.py:55-80)
UNIX_RANGES = [
    ("UNIX_SECONDS", 631152000, 1893456000),
    ("UNIX_MILLISECONDS", 631152000000, 1893456000000),
    ("UNIX_MICROSECONDS", 631152000000000, 1893456000000000),
    ("UNIX_NANOSECONDS", 631152000000000000, 1893456000000000000),
]
_UNIX_FORMATS = {label for label, _, _ in UNIX_RANGES}


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
            fs.custom["time_match_ratio"] = frac
        if considered >= MIN_EXAMPLES and frac >= MATCH_FRACTION and best[0]:
            # exact reference rendering (time_stats_generator.py:415-426)
            if best[0] in _UNIX_FORMATS:
                fs.custom["domain_info"] = "time_domain {integer_format: %s}" % best[0]
            else:
                fs.custom["domain_info"] = "time_domain {string_format: '%s'}" % best[0]
    return stats
