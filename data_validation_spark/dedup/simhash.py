"""SimHash near-duplicate detection: 64-bit locality-sensitive fingerprints
from token hashes; near-dups = fingerprints within a Hamming radius, found by
the standard block-permutation trick (split 64 bits into ``radius+1`` blocks —
any pair within the radius shares at least one exact block → equi-join on
(block index, block value), then exact Hamming verify).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def simhash64(text: str) -> int:
    tokens = (text or "").split()
    if not tokens:
        return 0
    hs = np.array(
        [
            (zlib.crc32(t.encode("utf-8", "ignore")) << 32)
            | zlib.crc32(t.encode("utf-8", "ignore"), 0x9E3779B9)
            for t in tokens
        ],
        dtype=np.uint64,
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    fp = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            fp |= np.uint64(1) << np.uint64(b)
    return int(fp.astype(np.int64))  # two's complement into long


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) — fully JVM-side SimHash.

    Token hashes are ``xxhash64(token)``; per-bit votes are one ``aggregate``
    fold over the token array (each token contributes ±1 per bit via a
    bitwise AND against a literal power-of-two array — no shift-by-column
    needed); the fingerprint ORs together the powers of two whose vote is
    positive. Empty/whitespace-only text fingerprints to 0. No Python runs
    per row, so the pass stays inside whole-stage codegen.
    """
    # Literal array of the 64 bit masks (bit 63 is the sign bit as a long).
    pow2 = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(64)
        ]
    )
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0)
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            pow2,
            lambda v, p: v
            + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            votes, pow2, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a.bitwiseOR(x),
    )
    fp = F.when(F.size(hashes) == 0, F.lit(0).cast("long")).otherwise(fp)
    return df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, radius: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b, hamming ≤ radius) via block-permutation buckets.

    Scale posture: instead of a block-equality **self-join** (quadratic blowup
    the moment one block value is hot — e.g. every empty/near-empty document
    fingerprints to 0), buckets are materialized with one groupBy shuffle and
    pairing happens inside buckets only, with a hard ``max_bucket_size`` cap
    (the same bound `minhash_lsh_candidates` uses). Degenerate fingerprint 0
    (empty text) is excluded up front — empty-vs-empty is exact-dedup
    territory, not near-dup.
    """
    fp = simhash_fingerprints(df, id_col, text_col).where(F.col("fingerprint") != 0)
    blocks = radius + 1
    width = 64 // blocks
    exploded = fp.select(
        "id",
        "fingerprint",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("fingerprint"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("x"),
    ).select("id", "fingerprint", F.col("x.blk").alias("blk"), F.col("x.bv").alias("bv"))
    buckets = (
        exploded.groupBy("blk", "bv")
        .agg(
            F.collect_list(F.struct("id", "fingerprint")).alias("members"),
        )
        .where((F.size("members") > 1) & (F.size("members") <= max_bucket_size))
    )

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_a, out_b, out_h = [], [], []
            for members in pdf["members"]:
                seen = {m["id"]: m["fingerprint"] for m in members}
                ids = sorted(seen)
                fps = np.array([seen[i] for i in ids], dtype=np.int64).view(np.uint64)
                ia, ib = np.triu_indices(len(ids), k=1)
                xor = fps[ia] ^ fps[ib]
                # vectorized popcount (byte-table over the 8 bytes of u64)
                ham = (
                    np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1)
                    .sum(axis=1)
                    .astype(np.int64)
                )
                keep = ham <= radius
                idarr = np.asarray(ids)
                out_a.extend(idarr[ia[keep]].tolist())
                out_b.extend(idarr[ib[keep]].tolist())
                out_h.extend(ham[keep].tolist())
            yield pd.DataFrame(
                {
                    "id_a": pd.Series(out_a, dtype="int64"),
                    "id_b": pd.Series(out_b, dtype="int64"),
                    "hamming": pd.Series(out_h, dtype="int32"),
                }
            )

    return (
        buckets.select("members")
        .mapInPandas(pairs, "id_a long, id_b long, hamming int")
        .dropDuplicates(["id_a", "id_b"])
    )
