"""Distributed sketch pass: per-partition Arrow-vectorized partial
accumulators (t-digest + count-min top-k + HLL), merged tree-wise.

Execution shape — the Spark translation of the reference's
CombinePerKey-with-hot-key-fanout over mergeable sketches
(``stats_impl.py:296-303``, ``basic_stats_generator.py:1417-1430``):

1. ``mapInPandas`` over the stacked long frame: each input partition builds
   one accumulator per (slice, feature) — values pre-grouped with
   ``value_counts`` before sketch insert — and emits it pickled.
2. When many partials exist, an intermediate salted merge stage combines
   per (slice, feature, salt) — the explicit two-tier combine / hot-key
   fanout for the single-slice skew case.
3. Final ``groupBy(slice, feature).applyInPandas`` merge → one extracted
   result row per key, collected on the driver (tiny).
"""

from __future__ import annotations

import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from data_validation_spark.stats import exprs as E
from data_validation_spark.stats.sketches.countmin import CountMinTopK
from data_validation_spark.stats.sketches.hll import HyperLogLog
from data_validation_spark.stats.sketches.tdigest import TDigest

_QUANTILE_CUTS = 100


class FeatureAccumulator:
    """All sketch state for one (slice, feature)."""

    __slots__ = ("topk", "hll", "td", "zeros", "posinf", "neginf", "fincnt",
                 "fsum", "fsumsq", "wsum")

    def __init__(self, options):
        self.topk = CountMinTopK(max_candidates=options.topk_sketch_size * 4)
        self.hll = HyperLogLog(options.hll_precision)
        self.td = TDigest(options.tdigest_compression)
        self.zeros = 0
        self.posinf = 0
        self.neginf = 0
        self.fincnt = 0
        self.fsum = 0.0
        self.fsumsq = 0.0
        self.wsum = 0.0

    def add_strings(self, values: pd.Series) -> None:
        counts = values.value_counts()
        vals = [str(v) for v in counts.index]
        self.topk.add_counts(vals, counts.to_numpy())
        self.hll.add(vals)

    def add_numbers(self, values: np.ndarray) -> None:
        v = values[~np.isnan(values)]
        self.posinf += int(np.count_nonzero(v == np.inf))
        self.neginf += int(np.count_nonzero(v == -np.inf))
        fin = v[np.isfinite(v)]
        self.fincnt += fin.size
        if fin.size:
            self.zeros += int(np.count_nonzero(fin == 0.0))
            self.fsum += float(fin.sum())
            self.fsumsq += float((fin * fin).sum())
            self.td.add(fin)

    def merge(self, other: "FeatureAccumulator") -> "FeatureAccumulator":
        self.topk = self.topk.merge(other.topk)
        self.hll = self.hll.merge(other.hll)
        self.td = self.td.merge(other.td)
        self.zeros += other.zeros
        self.posinf += other.posinf
        self.neginf += other.neginf
        self.fincnt += other.fincnt
        self.fsum += other.fsum
        self.fsumsq += other.fsumsq
        return self

    def compact(self) -> None:
        self.td.compact()


_PARTIAL_DDL = "slice_key string, feature string, acc binary"


def run_sketch_pass(df, plans, slice_col, options):
    """Returns (topk_data, uniq_data, arr_data, wtopk_data) with the same
    shapes as the exact long pass (see engine._run_long_pass). Sketch mode
    tracks weighted counts inside the CMS accumulator, so the weighted top-k
    reuses topk_data ordering (approximate path; exact mode emits both)."""
    long_df = E.long_format(
        df, plans, slice_col, options.weight_column, include_scalar_numeric=True
    )
    if long_df is None:
        return {}, {}, {}, {}

    opts = options

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[tuple[str, str], FeatureAccumulator] = {}
        for pdf in batches:
            for (sk, feat), g in pdf.groupby(["slice_key", "feature"], sort=False):
                acc = accs.get((sk, feat))
                if acc is None:
                    acc = accs[(sk, feat)] = FeatureAccumulator(opts)
                sv = g["str_value"].dropna()
                if len(sv):
                    acc.add_strings(sv)
                nv = g["num_value"].dropna().to_numpy(dtype=np.float64)
                if nv.size:
                    acc.add_numbers(nv)
        rows = []
        for (sk, feat), acc in accs.items():
            acc.compact()
            rows.append((sk, feat, pickle.dumps(acc, protocol=4)))
        yield pd.DataFrame(rows, columns=["slice_key", "feature", "acc"])

    partials = long_df.mapInPandas(partial, _PARTIAL_DDL)

    # Two-tier merge when many partials would pile onto one (slice, feature)
    # reducer — the explicit hot-key fanout.
    num_parts = long_df.rdd.getNumPartitions() if hasattr(long_df, "rdd") else 32
    if num_parts > 64:
        salted = partials.withColumn(
            "salt", F.pmod(F.xxhash64(F.rand(seed=7)), F.lit(16))
        )
        partials = (
            salted.groupBy("slice_key", "feature", "salt")
            .applyInPandas(_merge_group_keep, _PARTIAL_DDL + ", salt bigint")
            .drop("salt")
        )

    merged = partials.groupBy("slice_key", "feature").applyInPandas(
        _merge_group_keep, _PARTIAL_DDL
    )
    rows = merged.collect()

    qs = [i / _QUANTILE_CUTS for i in range(_QUANTILE_CUTS + 1)]
    k = max(options.num_top_values, options.num_rank_histogram_buckets)
    topk_data: dict = {}
    uniq_data: dict = {}
    arr_data: dict = {}
    for r in rows:
        acc: FeatureAccumulator = pickle.loads(bytes(r["acc"]))
        key = (r["slice_key"], r["feature"])
        top = acc.topk.top_k(k)
        if top:
            topk_data[key] = [
                (rank, v, float(c), float(c)) for rank, (v, c) in enumerate(top, start=1)
            ]
            uniq_data[key] = acc.hll.estimate()
        if acc.fincnt or acc.posinf or acc.neginf:
            mean = acc.fsum / acc.fincnt if acc.fincnt else 0.0
            var = max(acc.fsumsq / acc.fincnt - mean * mean, 0.0) if acc.fincnt else 0.0
            quants = acc.td.quantiles(qs) if acc.fincnt else None
            arr_data[key] = {
                "min": (-np.inf if acc.neginf else acc.td.min) if acc.fincnt or acc.neginf else None,
                "max": (np.inf if acc.posinf else acc.td.max) if acc.fincnt or acc.posinf else None,
                "mean": mean,
                "std": float(np.sqrt(var)),
                "zeros": acc.zeros,
                "posinf": acc.posinf,
                "neginf": acc.neginf,
                "finmin": acc.td.min if acc.fincnt else None,
                "finmax": acc.td.max if acc.fincnt else None,
                "fincnt": acc.fincnt,
                "quants": quants,
            }
    return topk_data, uniq_data, arr_data, dict(topk_data)


def _merge_group_keep(pdf: pd.DataFrame) -> pd.DataFrame:
    accs = [pickle.loads(bytes(b)) for b in pdf["acc"]]
    merged = accs[0]
    for a in accs[1:]:
        merged = merged.merge(a)
    merged.compact()
    out = pdf.iloc[[0]].copy()
    out["acc"] = [pickle.dumps(merged, protocol=4)]
    return out
