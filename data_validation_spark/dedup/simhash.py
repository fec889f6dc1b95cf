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
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "fingerprint": [simhash64(t) for t in pdf[text_col]]}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"id {df.schema[id_col].dataType.simpleString()}, fingerprint long"
    )


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, radius: int = 3
) -> DataFrame:
    """Pairs (id_a < id_b, hamming ≤ radius) via block-permutation join."""
    fp = simhash_fingerprints(df, id_col, text_col).cache()
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
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bv") == F.col("b.bv")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))).alias(
                "hamming"
            ),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= radius)
    )
    return cand
