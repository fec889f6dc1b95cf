"""Histogram construction from quantile boundaries.

Numpy port of the reference's histogram math
(``tensorflow_data_validation/utils/quantiles_util.py:49-379``):

* QUANTILES histogram: equal-mass buckets from quantile boundaries, with
  duplicate-boundary (point-mass) coalescing.
* STANDARD histogram: equi-width buckets derived from a finer quantile grid by
  interval-overlap interpolation (the reference computes 100× the requested
  bucket count of quantiles, then redistributes assuming uniform in-bucket
  mass), with dedicated ±inf buckets and a NaN count.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from data_validation_spark.stats.result import Histogram, HistogramBucket


def get_bin_weights(boundaries, cumulative_counts):
    """Faithful port of ``quantiles_util.py:49-89`` (``_get_bin_weights``):
    per-bin weights from (possibly duplicated) boundaries + cumulative
    counts. Weight of bins sharing an upper bound is spread evenly across
    them, and the min element's own count (``cumulative_counts[0]``) is
    spread across the leading identical bins — duplicates are KEPT as
    distinct point-mass buckets, not coalesced."""
    b = np.asarray(boundaries, dtype=np.float64)
    cum = np.asarray(cumulative_counts, dtype=np.float64)
    low, high = b[:-1], b[1:]
    counts = np.diff(cum)
    n = low.size
    i = 0
    while i < n:
        j = i + 1
        while j < n and high[i] == high[j]:
            j += 1
        if j > i + 1:
            counts[i:j] = counts[i:j].sum() / (j - i)
        i = j
    i = 0
    while i < n and low[0] == low[i] and high[0] == high[i]:
        i += 1
    if i > 0:
        counts[0:i] += cum[0] / i
    return low, high, counts


def quantiles_histogram(
    boundaries: Sequence[float],
    total_count: float,
    num_buckets: int,
    num_nan: int = 0,
    cumulative_counts: Optional[Sequence[float]] = None,
) -> Optional[Histogram]:
    """Equal-mass histogram from ``num_buckets+1`` quantile boundaries via the
    reference's duplicate-spreading rule (``_get_bin_weights``).

    ``boundaries`` must be the quantiles at i/num_buckets, i=0..num_buckets
    (a finer grid is resampled down). Without explicit ``cumulative_counts``
    the grid is equal-mass by construction — cum[i] = total·i/n, with
    cum[0] = 0 (the min's multiplicity is unknown from a percentile grid;
    the reference's sketch knows it and folds it into the first bucket — a
    bounded divergence only when the minimum value is heavily duplicated).
    """
    if boundaries is None or total_count <= 0:
        return None
    b = [float(x) for x in boundaries]
    if cumulative_counts is not None:
        cum = [float(x) for x in cumulative_counts]
    else:
        cum = [total_count * i / (len(b) - 1) for i in range(len(b))]
    if len(b) != num_buckets + 1:
        # Resample a finer grid down to num_buckets.
        idx = np.linspace(0, len(b) - 1, num_buckets + 1).round().astype(int)
        b = [b[i] for i in idx]
        cum = [cum[i] for i in idx]
    low, high, counts = get_bin_weights(b, cum)
    buckets = [
        HistogramBucket(float(low[i]), float(high[i]), float(counts[i]))
        for i in range(low.size)
    ]
    return Histogram("QUANTILES", buckets, num_nan=num_nan)


def equi_width_histogram(
    fine_boundaries: Sequence[float],
    total_count: float,
    num_buckets: int,
    num_nan: int = 0,
    num_pos_inf: int = 0,
    num_neg_inf: int = 0,
) -> Optional[Histogram]:
    """STANDARD equi-width histogram by overlap interpolation.

    ``fine_boundaries``: quantiles of the *finite* values at a fine grid
    (length K+1 ⇒ each interval carries total_count/K mass; the reference uses
    K = 100 × num_buckets, cf. ``basic_stats_generator.py:1163-1170``).
    ±inf counts become their own end buckets (``quantiles_util.py`` inf
    handling); NaN count is carried on the histogram.
    """
    if fine_boundaries is None or total_count <= 0:
        if num_pos_inf or num_neg_inf:
            buckets = []
            if num_neg_inf:
                buckets.append(HistogramBucket(float("-inf"), float("-inf"), num_neg_inf))
            if num_pos_inf:
                buckets.append(HistogramBucket(float("inf"), float("inf"), num_pos_inf))
            return Histogram("STANDARD", buckets, num_nan=num_nan)
        return None
    q = np.asarray(fine_boundaries, dtype=np.float64)
    k = len(q) - 1
    if k < 1:
        return None
    mass = total_count / k  # mass per fine quantile interval
    lo, hi = float(q[0]), float(q[-1])
    counts = np.zeros(num_buckets, dtype=np.float64)
    if hi == lo:
        counts[0] = total_count
        edges = [lo + i * 0.0 for i in range(num_buckets + 1)]
        buckets = [HistogramBucket(lo, hi, float(total_count))]
    else:
        width = (hi - lo) / num_buckets
        edges = lo + width * np.arange(num_buckets + 1)
        edges[-1] = hi
        ql, qr = q[:-1], q[1:]
        for i in range(num_buckets):
            el, er = edges[i], edges[i + 1]
            # Overlap of each fine interval [ql,qr] with bin [el,er], assuming
            # uniform mass; zero-width fine intervals (point mass) land in the
            # bin containing the point (right-closed on the last bin).
            span = qr - ql
            with np.errstate(invalid="ignore", divide="ignore"):
                overlap = (np.minimum(qr, er) - np.maximum(ql, el)) / span
            overlap = np.clip(overlap, 0.0, 1.0)
            if i == num_buckets - 1:
                point = (span == 0) & (ql >= el) & (ql <= er)
            else:
                point = (span == 0) & (ql >= el) & (ql < er)
            overlap = np.where(span == 0, point.astype(np.float64), overlap)
            counts[i] = overlap.sum() * mass
        buckets = [
            HistogramBucket(float(edges[i]), float(edges[i + 1]), float(counts[i]))
            for i in range(num_buckets)
        ]
    if num_neg_inf:
        buckets.insert(0, HistogramBucket(float("-inf"), lo, float(num_neg_inf)))
    if num_pos_inf:
        buckets.append(HistogramBucket(hi, float("inf"), float(num_pos_inf)))
    return Histogram("STANDARD", buckets, num_nan=num_nan)


def median_from_boundaries(boundaries: Sequence[float]) -> float:
    """Median from quantile boundaries (``quantiles_util.py:23-46``): odd
    count → middle boundary; even count → mean of the two middles."""
    n = len(boundaries)
    if n == 0:
        return float("nan")
    mid = n // 2
    if n % 2 == 0:
        return (float(boundaries[mid - 1]) + float(boundaries[mid])) / 2.0
    return float(boundaries[mid])
