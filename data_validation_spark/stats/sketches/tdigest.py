"""Mergeable t-digest quantile sketch (Dunning & Ertl's merging variant),
numpy-vectorized buffering with an O(num centroids) compress step.

Replaces the reference's tfx_bsl KLL QuantilesSketch in the sketch-mode
statistics pass: same protocol (add / merge / compact / extract-quantiles),
order-insensitive and compact-stable, so accumulators can be partially
aggregated per partition and tree-merged.
"""

from __future__ import annotations

import math

import numpy as np


class TDigest:
    __slots__ = ("compression", "means", "weights", "points", "_buf_v",
                 "_buf_w", "count", "_min", "_max")

    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        # points[i] is True when centroid i holds a SINGLE distinct value
        # (Dunning's singleton handling): such a centroid is an indivisible
        # point mass and must not be interpolated across — critical for
        # weighted discrete data, where one heavy value forms one centroid.
        self.points = np.empty(0, dtype=bool)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self.count = 0.0
        self._min = math.inf
        self._max = -math.inf

    # ------------------------------------------------------------------ add
    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        finite = np.isfinite(v)
        v = v[finite]
        if v.size == 0:
            return
        # The finite mask must be applied to BOTH arrays — positional
        # truncation would mispair weights with values when NaN/inf present.
        w = (
            np.ones_like(v)
            if weights is None
            else np.asarray(weights, dtype=np.float64)[finite]
        )
        self._buf_v.append(v)
        self._buf_w.append(w)
        self.count += float(w.sum())
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        if sum(x.size for x in self._buf_v) > 8 * self.compression:
            self.compact()

    # ---------------------------------------------------------------- merge
    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.compression)
        self.compact()
        other.compact()
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out.points = np.concatenate([self.points, other.points])
        out.count = self.count + other.count
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        out.compact()
        return out

    # -------------------------------------------------------------- compact
    def compact(self) -> None:
        if self._buf_v:
            bv = np.concatenate(self._buf_v)
            bw = np.concatenate(self._buf_w)
            self._buf_v, self._buf_w = [], []
            self.means = np.concatenate([self.means, bv])
            self.weights = np.concatenate([self.weights, bw])
            # every raw sample is a point (single distinct value)
            self.points = np.concatenate(
                [self.points, np.ones(bv.size, dtype=bool)]
            )
        n = self.means.size
        if n == 0:
            return
        order = np.argsort(self.means, kind="mergesort")
        means = self.means[order]
        weights = self.weights[order]
        points = self.points[order]
        total = weights.sum()
        if total <= 0:
            self.means = means
            self.weights = weights
            self.points = points
            return
        # Canonical k1-scale merge (Dunning's merging digest): adjacent
        # centroids merge while the k-span k(q_right) − k(q_left) ≤ 1 with
        # k(q) = (δ/2π)·asin(2q−1). Unlike a flat "weight ≤ max(limit, 1)"
        # floor this never merges a heavy weighted sample across distinct
        # values (the floor assumed unit-weight counts; hypothesis found the
        # fractional-weight case where it smeared a point mass) and keeps
        # tail resolution with a ~δ bound on centroid count.
        from math import asin, pi
        kf = self.compression / (2.0 * pi)

        def k_of(q: float) -> float:
            return kf * asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))

        new_means: list[float] = []
        new_weights: list[float] = []
        new_points: list[bool] = []
        cur_m = means[0]
        cur_w = weights[0]
        cur_p = bool(points[0])
        acc = 0.0  # weight before current centroid
        k_left = k_of(0.0)
        for i in range(1, n):
            if cur_p and points[i] and means[i] == cur_m:
                # Identical point values merge UNCONDITIONALLY (not gated by
                # the k-span): combining equal-valued point masses loses no
                # information — the centroid stays an exact indivisible step
                # in the CDF. Gating this on the span forced heavy discrete
                # values (mass > span) to split across centroids, whose
                # fragments then averaged with NEIGHBORING values into mixed
                # centroids on re-compact after merge() — smearing the point
                # structure and costing ~1% rank error where exactness is
                # free. With this rule, a distinct value whose mass beats the
                # local k-span survives as one point centroid and its
                # quantiles are exact; lower-mass values may still be
                # absorbed into mixed centroids per the normal k1 rule
                # (bounded rank error, pinned by the hypothesis property).
                cur_w += weights[i]
                continue
            q_right = (acc + cur_w + weights[i]) / total
            if k_of(q_right) - k_left <= 1.0:
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (
                    cur_w + weights[i]
                )
                cur_w += weights[i]
                cur_p = False
            else:
                new_means.append(cur_m)
                new_weights.append(cur_w)
                new_points.append(cur_p)
                acc += cur_w
                k_left = k_of(acc / total)
                cur_m = means[i]
                cur_w = weights[i]
                cur_p = bool(points[i])
        new_means.append(cur_m)
        new_weights.append(cur_w)
        new_points.append(cur_p)
        self.means = np.asarray(new_means)
        self.weights = np.asarray(new_weights)
        self.points = np.asarray(new_points, dtype=bool)

    # ------------------------------------------------------------- quantile
    def quantile(self, q: float) -> float:
        """Inverse CDF with boundary-zone interpolation: each centroid spans
        its own weight interval; values interpolate between neighboring
        centroid means only inside a transition zone of half the SMALLER
        neighbor's weight around each boundary, and the interior of a
        centroid returns its mean. For unit-weight (continuous) streams this
        is identical to the classic midpoint interpolation; for a heavy
        single-sample centroid (weighted discrete data) it keeps the rank
        error bounded instead of smearing the point mass toward neighbors
        (found by the hypothesis rank-error property)."""
        self.compact()
        n = self.means.size
        if n == 0:
            return float("nan")
        if n == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        w = self.weights
        means = self.means
        # Interpolatable half-width in mass units: a point centroid (single
        # distinct value) is an indivisible step — half-width 0 — while a
        # mixed centroid spreads half its mass to each side. Transition
        # zones take the SMALLER neighboring half-width, so interpolation
        # never crosses a point mass (rank-correct on weighted discrete
        # data) and reduces to classic midpoint interpolation for merged
        # continuous centroids.
        h = np.where(self.points, 0.0, w / 2.0)
        C = np.cumsum(w)
        total = C[-1]
        target = q * total
        i = int(np.searchsorted(C, target, side="left"))
        i = min(i, n - 1)
        # leading / trailing edges interpolate to min / max
        if i == 0 and target <= h[0]:
            frac = target / h[0] if h[0] else 0.0
            return float(self._min + (means[0] - self._min) * frac)
        if i == n - 1 and target >= total - h[-1] and h[-1]:
            frac = (target - (total - h[-1])) / h[-1]
            return float(means[-1] + (self._max - means[-1]) * frac)
        left_edge = C[i] - w[i]
        right_edge = C[i]
        if i > 0:
            z = min(h[i - 1], h[i])
            if z and target < left_edge + z:
                frac = (target - (left_edge - z)) / (2 * z)
                return float(means[i - 1] + (means[i] - means[i - 1]) * frac)
        if i < n - 1:
            z = min(h[i], h[i + 1])
            if z and target > right_edge - z:
                frac = (target - (right_edge - z)) / (2 * z)
                return float(means[i] + (means[i + 1] - means[i]) * frac)
        return float(means[i])

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    @property
    def min(self) -> float:
        return self._min

    @property
    def max(self) -> float:
        return self._max
