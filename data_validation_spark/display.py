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


# ------------------------------------------------------ skew-result tables --
def get_skew_result_dataframe(skew_results) -> pd.DataFrame:
    """FeatureSkew results as a DataFrame — reference
    display_util.py:717-750 column-for-column. Accepts an iterable of
    FeatureSkew objects or a SkewResult (its feature_skew values are used)."""
    if hasattr(skew_results, "feature_skew"):
        skew_results = skew_results.feature_skew.values()
    rows = [
        (
            fs.feature,
            fs.base_count,
            fs.test_count,
            fs.match_count,
            fs.base_only,
            fs.test_only,
            fs.mismatch_count,
            fs.diff_count,
        )
        for fs in skew_results
    ]
    columns = [
        "feature_name",
        "base_count",
        "test_count",
        "match_count",
        "base_only",
        "test_only",
        "mismatch_count",
        "diff_count",
    ]
    return (
        pd.DataFrame(rows, columns=columns)
        .sort_values("feature_name")
        .reset_index(drop=True)
    )


def get_match_stats_dataframe(match_stats) -> pd.DataFrame:
    """MatchStats as a one-row DataFrame — reference display_util.py:753-770
    columns. Our detector tracks per-side duplicate counts; the reference's
    single ``duplicate_id_count`` is their sum, and the missing-id-feature
    counters are emitted when the stats object carries them (0 otherwise)."""
    return pd.DataFrame.from_dict(
        {
            "base_with_id_count": [match_stats.base_with_id_count],
            "test_with_id_count": [match_stats.test_with_id_count],
            "identifiers_count": [match_stats.identifiers_count],
            "ids_missing_in_base_count": [match_stats.ids_missing_in_base_count],
            "ids_missing_in_test_count": [match_stats.ids_missing_in_test_count],
            "matching_pairs_count": [match_stats.matching_pairs_count],
            "base_missing_id_count": [getattr(match_stats, "base_missing_id_count", 0)],
            "test_missing_id_count": [getattr(match_stats, "test_missing_id_count", 0)],
            "duplicate_id_count": [
                match_stats.duplicate_id_count_base
                + match_stats.duplicate_id_count_test
            ],
        }
    )


def get_confusion_count_dataframes(confusion) -> dict:
    """Per-feature confusion tables — reference display_util.py:772-810:
    for each confusion feature, the unequal (base, test) value pairs with
    pair/base/test counts, sorted by base value then fraction-of-base.
    Accepts the detector's ``confusion_counts`` Spark DataFrame (collected
    here — it is per-category-pair sized) or any iterable of rows with
    (feature_name, base_value, test_value, count)."""
    if hasattr(confusion, "collect"):
        confusion = confusion.collect()
    per_feature: dict[str, list] = {}
    for r in confusion:
        per_feature.setdefault(r[0], []).append((r[1], r[2], int(r[3])))

    def _build_df(pairs):
        base_count: dict[str, int] = {}
        test_count: dict[str, int] = {}
        for b, t, n in pairs:
            base_count[b] = base_count.get(b, 0) + n
            test_count[t] = test_count.get(t, 0) + n
        df = pd.DataFrame(
            pairs, columns=("Base value", "Test value", "Pair count")
        )
        df["Base count"] = df["Base value"].map(base_count)
        df["Test count"] = df["Test value"].map(test_count)
        df["Fraction of base"] = df["Pair count"] / df["Base count"]
        df = (
            df[df["Base value"] != df["Test value"]]
            .sort_values(["Base value", "Fraction of base"])
            .reset_index(drop=True)
        )
        return df[
            ["Base value", "Test value", "Pair count", "Base count", "Test count"]
        ]

    return {name: _build_df(pairs) for name, pairs in sorted(per_feature.items())}


# --------------------------------------------------- statistics HTML / viz --
def _get_default_slice_stats(stats: "DatasetStatsList") -> "DatasetStatsList":
    from data_validation_spark.stats.result import DatasetStatsList

    if len(stats.slices) == 1:
        return stats
    from data_validation_spark.stats_view import DatasetListView

    return DatasetStatsList([DatasetListView(stats).get_default_slice_or_die().proto()])


def _project_statistics(
    stats: "DatasetStatsList", allowlist_features=None, denylist_features=None
) -> "DatasetStatsList":
    """Allowlist/denylist feature projection — reference
    display_util._project_statistics:339-364."""
    from dataclasses import replace

    from data_validation_spark.paths import normalize_feature_id
    from data_validation_spark.stats.result import DatasetStatsList

    if allowlist_features is None and denylist_features is None:
        return stats
    if allowlist_features is not None:
        keep = {normalize_feature_id(p).to_path() for p in allowlist_features}
        pred = lambda name: name in keep  # noqa: E731
    else:
        drop = {normalize_feature_id(p).to_path() for p in denylist_features}
        pred = lambda name: name not in drop  # noqa: E731
    return DatasetStatsList(
        [
            replace(sl, features={n: f for n, f in sl.features.items() if pred(n)})
            for sl in stats.slices
        ]
    )


def _get_combined_statistics(
    lhs_statistics: "DatasetStatsList",
    rhs_statistics: "DatasetStatsList" = None,
    lhs_name=None,
    rhs_name=None,
    allowlist_features=None,
    denylist_features=None,
) -> "DatasetStatsList":
    """Combine lhs/rhs default-slice stats into a two-dataset artifact —
    reference display_util._get_combined_statistics:377-436 (same naming
    fallbacks, including the reset to lhs_/rhs_statistics on a name clash)."""
    from dataclasses import replace

    from data_validation_spark.stats.result import DatasetStatsList

    if not hasattr(lhs_statistics, "slices"):
        raise TypeError(
            "lhs_statistics is of type %s, should be a DatasetStatsList "
            "artifact." % type(lhs_statistics).__name__
        )
    lhs_statistics = _get_default_slice_stats(lhs_statistics)
    if lhs_name is None:
        lhs_name = lhs_statistics.slices[0].slice_key or "lhs_statistics"
    lhs_statistics = _project_statistics(
        lhs_statistics, allowlist_features, denylist_features
    )
    datasets = [lhs_statistics.slices[0]]

    if rhs_statistics is not None:
        if not hasattr(rhs_statistics, "slices"):
            raise TypeError(
                "rhs_statistics is of type %s, should be a DatasetStatsList "
                "artifact." % type(rhs_statistics).__name__
            )
        rhs_statistics = _get_default_slice_stats(rhs_statistics)
        if rhs_name is None:
            rhs_name = rhs_statistics.slices[0].slice_key or "rhs_statistics"
        if lhs_name == rhs_name:
            lhs_name, rhs_name = "lhs_statistics", "rhs_statistics"
        rhs_statistics = _project_statistics(
            rhs_statistics, allowlist_features, denylist_features
        )
        datasets.append(replace(rhs_statistics.slices[0], slice_key=rhs_name))

    datasets[0] = replace(datasets[0], slice_key=lhs_name)
    return DatasetStatsList(datasets)


_HTML_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Statistics overview</title>
<style>
body {{ font-family: sans-serif; margin: 1.5em; }}
table {{ border-collapse: collapse; margin-bottom: 2em; }}
th, td {{ border: 1px solid #ccc; padding: 4px 10px; text-align: right; }}
th {{ background: #f0f0f0; }} td:first-child, th:first-child {{ text-align: left; }}
h2 {{ margin-bottom: 0.3em; }}
</style></head>
<body data-statistics-b64="{payload}">
{sections}
</body></html>"""


def get_statistics_html(
    lhs_statistics: "DatasetStatsList",
    rhs_statistics: "DatasetStatsList" = None,
    lhs_name: str = "lhs_statistics",
    rhs_name: str = "rhs_statistics",
    allowlist_features=None,
    denylist_features=None,
) -> str:
    """Self-contained HTML overview of one (or a compared pair of)
    statistics artifacts — the reference (display_util.py:437-506) embeds the
    base64 proto in a Facets iframe; we have no notebook/Facets dependency,
    so this renders per-feature summary tables directly and embeds the
    combined artifact JSON base64 in ``data-statistics-b64`` (the
    machine-readable payload, same role as the reference's ``protostr``)."""
    import base64

    from data_validation_spark.stats.result import DatasetStatsList

    combined = _get_combined_statistics(
        lhs_statistics,
        rhs_statistics,
        lhs_name,
        rhs_name,
        allowlist_features,
        denylist_features,
    )
    if len(combined.slices) == 1 and combined.slices[0].num_examples == 0:
        return "<p>Empty dataset.</p>"
    payload = base64.b64encode(
        combined.to_json(indent=None).encode("utf-8")
    ).decode("ascii")
    sections = []
    for sl in combined.slices:
        df = get_statistics_dataframe(DatasetStatsList([sl]))
        body = df.drop(columns=["slice_key"]).to_html(index=False, na_rep="")
        sections.append(
            "<h2>%s</h2><p>%d examples</p>\n%s"
            % (sl.slice_key, sl.num_examples, body)
        )
    return _HTML_PAGE.format(payload=payload, sections="\n".join(sections))


def visualize_statistics(
    lhs_statistics: "DatasetStatsList",
    rhs_statistics: "DatasetStatsList" = None,
    lhs_name: str = "lhs_statistics",
    rhs_name: str = "rhs_statistics",
    allowlist_features=None,
    denylist_features=None,
) -> str:
    """Reference display_util.visualize_statistics:508-547 — renders in an
    IPython notebook when one is attached, and always returns the HTML (the
    spark-submit-driver-friendly form)."""
    assert (
        not allowlist_features or not denylist_features
    ), "Only specify one of allowlist_features and denylist_features."
    html = get_statistics_html(
        lhs_statistics,
        rhs_statistics,
        lhs_name,
        rhs_name,
        allowlist_features,
        denylist_features,
    )
    try:  # pragma: no cover - notebook-only path
        from IPython.display import HTML, display

        display(HTML(html))
    except ImportError:
        pass
    return html


def _nl_histogram_df(low, high, counts) -> pd.DataFrame:
    """Histogram-bucket frame — reference display_util._get_histogram_dataframe
    columns (high_values/low_values/sample_counts)."""
    return pd.DataFrame.from_dict(
        {
            "high_values": list(high),
            "low_values": list(low),
            "sample_counts": list(counts),
        }
    )


def _nl_token_length_histogram(nl: dict) -> pd.DataFrame:
    """Token-length histogram frame from the engine's equal-mass quantile
    grid (each bucket holds total_tokens / nbuckets samples)."""
    q = nl.get("token_length_quantiles") or []
    if len(q) < 2:
        return _nl_histogram_df([], [], [])
    per_bucket = nl.get("total_tokens", 0) / (len(q) - 1)
    return _nl_histogram_df(q[:-1], q[1:], [per_bucket] * (len(q) - 1))


def _nl_token_statistics(nl: dict) -> pd.DataFrame:
    """Per-token stats frame — reference display_util._get_token_statistics
    columns; ``positions`` cells hold per-token position-histogram frames."""
    nbuckets = nl.get("num_position_buckets", 10)
    cols = {
        "token_name": [],
        "frequency": [],
        "fraction_of_sequences": [],
        "per_sequence_min_frequency": [],
        "per_sequence_max_frequency": [],
        "per_sequence_avg_frequency": [],
        "positions": [],
    }
    for token, st in (nl.get("token_statistics") or {}).items():
        cols["token_name"].append(token)
        cols["frequency"].append(st["frequency"])
        cols["fraction_of_sequences"].append(st["fraction_of_sequences"])
        cols["per_sequence_min_frequency"].append(st["per_sequence_min_frequency"])
        cols["per_sequence_max_frequency"].append(st["per_sequence_max_frequency"])
        cols["per_sequence_avg_frequency"].append(st["per_sequence_avg_frequency"])
        pos = st.get("positions") or {}
        buckets = sorted(int(b) for b in pos)
        cols["positions"].append(
            _nl_histogram_df(
                [b / nbuckets for b in buckets],
                [(b + 1) / nbuckets for b in buckets],
                [pos[b] if b in pos else pos[str(b)] for b in buckets],
            )
        )
    return pd.DataFrame.from_dict(cols)


def get_natural_language_statistics_dataframes(
    lhs_statistics: "DatasetStatsList",
    rhs_statistics: "DatasetStatsList" = None,
    lhs_name: str = "lhs_statistics",
    rhs_name: str = "rhs_statistics",
    allowlist_features=None,
    denylist_features=None,
):
    """NL statistics as plot-ready DataFrames — reference
    ``display_util.get_natural_language_statistics_dataframes:574-649``:
    {dataset_name: {feature_name: {"token_length_histogram": df,
    "token_statistics": df}}}, or None when no feature carries the
    ``nl_statistics`` custom stat."""
    combined = _get_combined_statistics(
        lhs_statistics,
        rhs_statistics,
        lhs_name,
        rhs_name,
        allowlist_features,
        denylist_features,
    )
    result = {}
    for sl in combined.slices:
        if not sl.slice_key:
            continue
        features = {}
        for fname, fs in sl.features.items():
            nl = fs.custom.get("nl_statistics")
            if not nl:
                continue
            features[fname] = {
                "token_length_histogram": _nl_token_length_histogram(nl),
                "token_statistics": _nl_token_statistics(nl),
            }
        if features:
            result[sl.slice_key] = features
    return result or None


def compare_slices(
    statistics: "DatasetStatsList", lhs_slice_key: str, rhs_slice_key: str
) -> str:
    """Compare two slices of one artifact — reference
    display_util.compare_slices:549-573; raises ValueError on an unknown
    slice key."""
    from data_validation_spark.stats_view import get_slice_stats

    lhs_stats = get_slice_stats(statistics, lhs_slice_key)
    rhs_stats = get_slice_stats(statistics, rhs_slice_key)
    return visualize_statistics(
        lhs_stats, rhs_stats, lhs_name=lhs_slice_key, rhs_name=rhs_slice_key
    )
