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
    __slots__ = ("compression", "means", "weights", "_buf_v", "_buf_w", "count", "_min", "_max")

    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
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
        n = self.means.size
        if n == 0:
            return
        order = np.argsort(self.means, kind="mergesort")
        means = self.means[order]
        weights = self.weights[order]
        total = weights.sum()
        # k1 scale function: centroid size limit 4·total·q(1−q)/compression
        new_means: list[float] = []
        new_weights: list[float] = []
        cur_m = means[0]
        cur_w = weights[0]
        acc = 0.0  # weight before current centroid
        for i in range(1, n):
            q = (acc + cur_w / 2) / total if total else 0.0
            limit = 4.0 * total * q * (1.0 - q) / self.compression
            if cur_w + weights[i] <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                new_means.append(cur_m)
                new_weights.append(cur_w)
                acc += cur_w
                cur_m = means[i]
                cur_w = weights[i]
        new_means.append(cur_m)
        new_weights.append(cur_w)
        self.means = np.asarray(new_means)
        self.weights = np.asarray(new_weights)

    # ------------------------------------------------------------- quantile
    def quantile(self, q: float) -> float:
        self.compact()
        n = self.means.size
        if n == 0:
            return float("nan")
        if n == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            lo, hi = self._min, float(self.means[0])
            frac = target / cum[0] if cum[0] else 0.0
            return lo + (hi - lo) * frac
        if target >= cum[-1]:
            lo, hi = float(self.means[-1]), self._max
            rest = total - cum[-1]
            frac = (target - cum[-1]) / rest if rest else 1.0
            return lo + (hi - lo) * frac
        idx = np.searchsorted(cum, target)
        lo_c, hi_c = cum[idx - 1], cum[idx]
        frac = (target - lo_c) / (hi_c - lo_c) if hi_c > lo_c else 0.0
        return float(self.means[idx - 1] + (self.means[idx] - self.means[idx - 1]) * frac)

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    @property
    def min(self) -> float:
        return self._min

    @property
    def max(self) -> float:
        return self._max
