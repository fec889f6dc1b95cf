"""Schema / anomalies / statistics rendering — the Spark-side counterpart of
the reference's ``tensorflow_data_validation/utils/display_util.py``.

Where the reference renders to facets HTML in a notebook, this module emits
pandas DataFrames (same columns/row shapes as the reference's
``get_schema_dataframe`` :63-208, ``get_anomalies_dataframe`` :224-287,
``get_drift_skew_dataframe`` :289-305) plus plain-text/markdown renderings
usable from a spark-submit driver log. All functions are driver-side over
KB-scale artifacts — no Spark jobs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Tuple

import pandas as pd

if TYPE_CHECKING:
    from data_validation_spark.anomalies import Anomalies
    from data_validation_spark.schema import Schema
    from data_validation_spark.stats.result import DatasetStatsList


def _quoted(s: str) -> str:
    return f"'{s}'"


def get_schema_dataframe(schema: "Schema") -> Tuple[pd.DataFrame, pd.DataFrame]:
    """(features, domains) DataFrames — reference display_util.py:63-208
    column-for-column: Feature name / Type / Presence / Valency / Domain,
    and Domain / Values."""
    domain_rows = []
    for dom in schema.string_domain or []:
        domain_rows.append([_quoted(dom.name), ", ".join(_quoted(v) for v in dom.value)])

    def min_max_string(mn, mx, fmt):
        parts = []
        if mn is not None:
            parts.append(f"min: {fmt(mn)}")
        if mx is not None:
            parts.append(f"max: {fmt(mx)}")
        return "; ".join(parts) if parts else "-"

    feature_rows = []
    for f in schema.feature or []:
        if f.presence is not None:
            presence = "required" if f.presence.min_fraction == 1.0 else "optional"
        else:
            presence = ""
        valency = ""
        vc = f.value_count
        if vc is not None:
            if vc.min == vc.max == 1:
                valency = "single"
            else:
                lo = f"[{vc.min}" if vc.min is not None else "[0"
                hi = f"{vc.max}]" if vc.max is not None else "inf)"
                valency = f"{lo},{hi}"
        ftype = f.type.name if f.type is not None else ""
        if ftype == "BYTES" and (f.domain or f.string_domain):
            ftype = "STRING"
        domain = "-"
        if f.domain:
            domain = _quoted(f.domain)
        elif f.int_domain is not None:
            domain = min_max_string(f.int_domain.min, f.int_domain.max, lambda v: f"{v:d}")
        elif f.float_domain is not None:
            fd = f.float_domain
            mn = fd.min if fd.min is not None else (None if fd.disallow_inf else float("-inf"))
            mx = fd.max if fd.max is not None else (None if fd.disallow_inf else float("inf"))
            domain = min_max_string(mn, mx, lambda v: f"{v:f}")
        elif f.string_domain is not None:
            domain = _quoted(f.string_domain.name or f"{f.name}_domain")
            domain_rows.append(
                [domain, ", ".join(_quoted(v) for v in f.string_domain.value)]
            )
        feature_rows.append([_quoted(f.name), ftype, presence, valency, domain])

    features = pd.DataFrame(
        feature_rows, columns=["Feature name", "Type", "Presence", "Valency", "Domain"]
    ).set_index("Feature name")
    domains = pd.DataFrame(domain_rows, columns=["Domain", "Values"]).set_index("Domain")
    return features, domains


def get_anomalies_dataframe(result: "Anomalies") -> pd.DataFrame:
    """Anomalies DataFrame — reference display_util.py:224-287: one row per
    feature (dataset-level anomalies appear as '[dataset anomaly]'), columns
    Feature name / Anomaly short description / Anomaly long description /
    Anomaly types."""
    rows = []
    for feature, info in sorted(result.feature_anomaly_info().items()):
        reasons = info["reasons"]
        short = info.get("short_description") or "; ".join(
            r["short_description"] for r in reasons
        )
        long_desc = info.get("description") or "; ".join(
            r["description"] for r in reasons
        )
        types = "; ".join(
            t.value if hasattr(t, "value") else str(t)
            for t in (r["type"] for r in reasons)
        )
        label = "[dataset anomaly]" if feature == "" else _quoted(feature)
        rows.append([label, short, long_desc, types])
    return pd.DataFrame(
        rows,
        columns=[
            "Feature name",
            "Anomaly short description",
            "Anomaly long description",
            "Anomaly types",
        ],
    ).set_index("Feature name")


def get_drift_skew_dataframe(result: "Anomalies") -> pd.DataFrame:
    """Drift/skew measurements — reference display_util.py:289-305."""
    rows = [
        (m.feature, m.metric, m.value, m.threshold) for m in result.drift_skew_info
    ]
    return pd.DataFrame(
        rows, columns=["path", "type", "value", "threshold"]
    ).set_index("path")


def get_statistics_dataframe(stats: "DatasetStatsList") -> pd.DataFrame:
    """Per-(slice, feature) summary table of the statistics artifact — the
    text counterpart of the reference's facets overview."""
    from data_validation_spark.stats.result import STATS_ROW_SCHEMA, stats_rows

    cols = [c.split(" ")[0] for c in STATS_ROW_SCHEMA.split(", ")]
    return pd.DataFrame(stats_rows(stats), columns=cols)


def _to_markdown(df: pd.DataFrame, index: bool = True) -> str:
    """Minimal GitHub-markdown table (pandas' to_markdown needs tabulate,
    which isn't in the image)."""
    cols = ([df.index.name or ""] if index else []) + [str(c) for c in df.columns]
    rows = []
    for key, row in df.iterrows():
        cells = ([str(key)] if index else []) + [str(v) for v in row.tolist()]
        rows.append(cells)
    widths = [
        max(len(cols[i]), *(len(r[i]) for r in rows)) if rows else len(cols[i])
        for i in range(len(cols))
    ]

    def line(cells):
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"

    sep = "|" + "|".join("-" * (w + 2) for w in widths) + "|"
    return "\n".join([line(cols), sep] + [line(r) for r in rows])


def display_schema(schema: "Schema") -> str:
    """Markdown rendering of (features, domains) — reference
    display_util.display_schema:209-222, text instead of notebook widgets."""
    features, domains = get_schema_dataframe(schema)
    out = [_to_markdown(features)]
    if len(domains):
        out += ["", _to_markdown(domains)]
    return "\n".join(out)


def display_anomalies(result: "Anomalies") -> str:
    """Markdown rendering — reference display_util.display_anomalies:325-339
    ('No anomalies found.' when clean)."""
    df = get_anomalies_dataframe(result)
    if df.empty:
        return "No anomalies found."
    return _to_markdown(df)


def display_statistics(stats: "DatasetStatsList", max_rows: int = 50) -> str:
    """Markdown summary of the statistics artifact (truncated)."""
    df = get_statistics_dataframe(stats)
    truncated = len(df) > max_rows
    txt = _to_markdown(df.head(max_rows), index=False)
    if truncated:
        txt += f"\n… ({len(df) - max_rows} more rows)"
    return txt
