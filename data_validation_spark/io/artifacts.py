"""Statistics-artifact IO + merge — the analogue of the reference's stats
sinks (``stats_api.py:112-223``): JSON artifact read/write, flat stats-row
parquet sink, and a driver-side merge of per-shard artifacts (tfx_bsl
merge_util role).

Merge semantics: counts/moments merge exactly (weighted by example counts);
min/max/zeros/NaN/inf add or combine exactly; top-k / rank histograms merge by
summing per-label counts (exact while every label is within each shard's rank
histogram — rank buckets default to 1000, so exact for ≤1000-cardinality
features, best-effort above); unique counts take the max across shards (a
lower bound — exact distinct does not merge) and are flagged
``unique_is_exact=False``; STANDARD histograms merge by union-boundary
rebucketing (same math as the drift aligner).
"""

from __future__ import annotations

import os
from typing import Optional

from data_validation_spark.stats.result import (
    BytesStats,
    CommonStats,
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
    Histogram,
    HistogramBucket,
    NumericStats,
    RankBucket,
    StringStats,
    STATS_ROW_SCHEMA,
    stats_rows,
)


def save_stats(stats: DatasetStatsList, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(stats.to_json())


def load_stats(path: str) -> DatasetStatsList:
    with open(path) as f:
        return DatasetStatsList.from_json(f.read())


def write_stats_rows(spark, stats: DatasetStatsList, path: str) -> None:
    """Flat (slice, feature, …) rows as parquet — the queryable sink."""
    spark.createDataFrame(stats_rows(stats), STATS_ROW_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


# ------------------------------------------------------------------- merge --
def merge_stats(shards: list[DatasetStatsList]) -> DatasetStatsList:
    """Merge per-shard artifacts (matching slices merged pairwise)."""
    by_slice: dict[str, list[DatasetStats]] = {}
    for sh in shards:
        for sl in sh.slices:
            by_slice.setdefault(sl.slice_key, []).append(sl)
    out = []
    for key in sorted(by_slice):
        parts = by_slice[key]
        merged = parts[0]
        for p in parts[1:]:
            merged = _merge_slice(merged, p)
        out.append(merged)
    return DatasetStatsList(out)


def _merge_slice(a: DatasetStats, b: DatasetStats) -> DatasetStats:
    out = DatasetStats(
        slice_key=a.slice_key,
        num_examples=a.num_examples + b.num_examples,
        weighted_num_examples=(
            (a.weighted_num_examples or 0) + (b.weighted_num_examples or 0)
            if a.weighted_num_examples is not None or b.weighted_num_examples is not None
            else None
        ),
    )
    for name in sorted(set(a.features) | set(b.features)):
        fa, fb = a.features.get(name), b.features.get(name)
        if fa is None or fb is None:
            out.features[name] = fa or fb
        else:
            out.features[name] = _merge_feature(fa, fb)
    return out


def _merge_feature(a: FeatureStats, b: FeatureStats) -> FeatureStats:
    out = FeatureStats(name=a.name, type=a.type if a.type != "UNKNOWN" else b.type)
    ca, cb = a.common, b.common
    n = ca.num_non_missing + cb.num_non_missing
    out.common = CommonStats(
        num_non_missing=n,
        num_missing=ca.num_missing + cb.num_missing,
        min_num_values=min(ca.min_num_values, cb.min_num_values)
        if ca.num_non_missing and cb.num_non_missing
        else max(ca.min_num_values, cb.min_num_values),
        max_num_values=max(ca.max_num_values, cb.max_num_values),
        tot_num_values=ca.tot_num_values + cb.tot_num_values,
        avg_num_values=(ca.tot_num_values + cb.tot_num_values) / n if n else 0.0,
    )
    if a.numeric and b.numeric:
        na, nb = a.numeric, b.numeric
        # Moment weights are FINITE VALUE counts: mean/std are computed over
        # flattened elements, so the weight base is tot_num_values (equal to
        # num_non_missing for scalar features, the element count for arrays);
        # clamp at 0 so a shard can never contribute a negative weight.
        wa = max(ca.tot_num_values - na.num_nan - na.num_pos_inf - na.num_neg_inf, 0)
        wb = max(cb.tot_num_values - nb.num_nan - nb.num_pos_inf - nb.num_neg_inf, 0)
        w = wa + wb
        # a shard mean can be ±inf/nan (infinities included in the reference
        # accumulator) — inf/nan propagates through the weighted merge, and
        # max(0, nan) puts std_dev at 0.0 like the single-pass path.
        mean = (na.mean * wa + nb.mean * wb) / w if w else 0.0
        # E[x²] reconstruction for merged variance
        exx = (
            ((na.std_dev**2 + na.mean**2) * wa + (nb.std_dev**2 + nb.mean**2) * wb) / w
            if w
            else 0.0
        )
        out.numeric = NumericStats(
            mean=mean,
            std_dev=max(0.0, exx - mean**2) ** 0.5,
            min=min(na.min, nb.min),
            max=max(na.max, nb.max),
            num_zeros=na.num_zeros + nb.num_zeros,
            num_nan=na.num_nan + nb.num_nan,
            num_pos_inf=na.num_pos_inf + nb.num_pos_inf,
            num_neg_inf=na.num_neg_inf + nb.num_neg_inf,
            finite_min=_opt_min(na.finite_min, nb.finite_min),
            finite_max=_opt_max(na.finite_max, nb.finite_max),
        )
        ha = na.histogram("STANDARD")
        hb = nb.histogram("STANDARD")
        hm = _merge_histograms(ha, hb)
        if hm is not None:
            out.numeric.histograms.append(hm)
            out.numeric.median = _median_from_histogram(hm)
    elif a.numeric or b.numeric:
        out.numeric = a.numeric or b.numeric
    if a.string and b.string:
        counts: dict[str, float] = {}
        for s in (a.string, b.string):
            for bk in s.rank_histogram:
                counts[bk.label] = counts.get(bk.label, 0.0) + bk.sample_count
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]), reverse=False)
        ranked.sort(key=lambda kv: (-kv[1], tuple(-c for c in kv[0].encode())))
        n_top = max(len(a.string.top_values), len(b.string.top_values), 1)
        n_rank = min(max(len(a.string.rank_histogram), len(b.string.rank_histogram),
                         len(ranked)), 1000)
        out.string = StringStats(
            unique=max(a.string.unique, b.string.unique),
            unique_is_exact=False,
            top_values=[(v, c) for v, c in ranked[:n_top]],
            avg_length=(
                a.string.avg_length * ca.tot_num_values
                + b.string.avg_length * cb.tot_num_values
            )
            / max(ca.tot_num_values + cb.tot_num_values, 1),
            rank_histogram=[
                RankBucket(i + 1, i + 1, v, c) for i, (v, c) in enumerate(ranked[:n_rank])
            ],
            invalid_utf8_count=a.string.invalid_utf8_count + b.string.invalid_utf8_count,
        )
        if a.string.weighted_rank_histogram and b.string.weighted_rank_histogram:
            wcounts: dict[str, float] = {}
            for s in (a.string, b.string):
                for bk in s.weighted_rank_histogram:
                    wcounts[bk.label] = wcounts.get(bk.label, 0.0) + bk.sample_count
            wranked = sorted(
                wcounts.items(), key=lambda kv: (-kv[1], tuple(-c for c in kv[0].encode()))
            )
            out.string.weighted_top_values = [(v, c) for v, c in wranked[:n_top]]
            out.string.weighted_rank_histogram = [
                RankBucket(i + 1, i + 1, v, c) for i, (v, c) in enumerate(wranked[:n_rank])
            ]
        elif a.string.weighted_rank_histogram or b.string.weighted_rank_histogram:
            # One shard carries weighted stats, the other doesn't (e.g. a
            # later shard computed without a weight column): propagate the
            # side that has them instead of silently dropping — mirrors the
            # `elif a.string or b.string` whole-struct propagation below.
            ws = a.string if a.string.weighted_rank_histogram else b.string
            out.string.weighted_top_values = list(ws.weighted_top_values)
            out.string.weighted_rank_histogram = list(ws.weighted_rank_histogram)
    elif a.string or b.string:
        out.string = a.string or b.string
    if a.bytes and b.bytes:
        ta, tb = ca.num_non_missing, cb.num_non_missing
        out.bytes = BytesStats(
            unique=max(a.bytes.unique, b.bytes.unique),
            avg_num_bytes=(a.bytes.avg_num_bytes * ta + b.bytes.avg_num_bytes * tb)
            / max(ta + tb, 1),
            min_num_bytes=min(a.bytes.min_num_bytes, b.bytes.min_num_bytes),
            max_num_bytes=max(a.bytes.max_num_bytes, b.bytes.max_num_bytes),
        )
    elif a.bytes or b.bytes:
        out.bytes = a.bytes or b.bytes
    # custom stats: image format histograms add; others keep first
    out.custom = dict(a.custom)
    for k, v in b.custom.items():
        if k == "image_format_histogram" and k in out.custom:
            merged = dict(out.custom[k])
            for fmt, c in v.items():
                merged[fmt] = merged.get(fmt, 0) + c
            out.custom[k] = merged
        elif k not in out.custom:
            out.custom[k] = v
    return out


def _merge_histograms(ha: Optional[Histogram], hb: Optional[Histogram]) -> Optional[Histogram]:
    if ha is None or hb is None:
        return ha or hb
    from data_validation_spark.validate.drift import _rebucket, _strip

    sa, pa, ia = _strip(ha)
    sb, pb, ib = _strip(hb)
    bounds = sorted(
        {x for bk in sa + sb for x in (bk.low_value, bk.high_value)}
    )
    if len(bounds) < 2:
        merged_counts, edges = [], []
    else:
        va = _rebucket(bounds, sa)
        vb = _rebucket(bounds, sb)
        merged_counts = [x + y for x, y in zip(va, vb)]
        edges = bounds
    buckets = [
        HistogramBucket(edges[i], edges[i + 1], merged_counts[i])
        for i in range(len(merged_counts))
    ]
    for pt in sorted(set(pa) | set(pb)):
        buckets.append(HistogramBucket(pt, pt, pa.get(pt, 0.0) + pb.get(pt, 0.0)))
    if ia or ib:
        buckets.append(HistogramBucket(float("-inf"), float("inf"), ia + ib))
    return Histogram("STANDARD", buckets, num_nan=ha.num_nan + hb.num_nan)


def _median_from_histogram(h: Histogram) -> float:
    total = h.total_count()
    if total <= 0:
        return 0.0
    acc = 0.0
    for b in h.buckets:
        if acc + b.sample_count >= total / 2:
            if b.sample_count <= 0 or b.high_value == b.low_value:
                return b.low_value
            frac = (total / 2 - acc) / b.sample_count
            return b.low_value + (b.high_value - b.low_value) * frac
        acc += b.sample_count
    return h.buckets[-1].high_value if h.buckets else 0.0


def _opt_min(a, b):
    vals = [v for v in (a, b) if v is not None]
    return min(vals) if vals else None


def _opt_max(a, b):
    vals = [v for v in (a, b) if v is not None]
    return max(vals) if vals else None
