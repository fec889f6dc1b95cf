"""HyperLogLog distinct-count sketch (numpy registers, mergeable by max).

Replaces the reference's KMV uniques sketch (16384 buckets ↔ p=14 here).
Standard HLL with linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash(values: list[str]) -> np.ndarray:
        import hashlib

        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            h = hashlib.blake2b(v.encode("utf-8", "surrogatepass"), digest_size=8).digest()
            out[i] = int.from_bytes(h, "little")
        return out

    def add(self, values: list[str]) -> None:
        if not values:
            return
        h = self._hash(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining bits in the top positions
        # rank = leading zeros of rest + 1 (capped)
        ranks = np.empty(h.size, dtype=np.uint8)
        for i in range(h.size):
            r = int(rest[i])
            if r == 0:
                ranks[i] = 64 - self.p + 1
            else:
                ranks[i] = (64 - r.bit_length()) + 1
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> int:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        e = alpha * m * m / inv_sum
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)  # linear counting
        return int(round(e))
