"""MinHash + LSH near-duplicate detection: shingle → minhash signature →
band → bucket-join → candidate pairs (→ optional exact-Jaccard verify).

Signatures are computed in one Arrow-vectorized pass (numpy multiply-shift
permutations over crc32 shingle hashes). Banding turns the O(n²) pair search
into one groupBy shuffle on (band, band-hash) buckets; pair explosion happens
inside buckets only. At cluster scale the bucket groupBy is the only shuffle
and hot buckets are bounded by ``max_bucket_size``.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_MERSENNE = (1 << 61) - 1


def _perm_params(num_hashes: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct crc32 hashes of the k-word shingles of ``text``."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.array([zlib.crc32(s.encode("utf-8", "ignore")) for s in shingles], dtype=np.uint64)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, shingle_k: int = 3
) -> DataFrame:
    """(id, signature array<long>) via one Arrow pass."""
    a, b = _perm_params(num_hashes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                h = _shingle_hashes(text or "", shingle_k)
                if h.size == 0:
                    sigs.append([0] * num_hashes)
                    continue
                # (num_hashes, n) permuted values; min along shingles
                vals = (np.outer(a, h) + b[:, None]) % np.uint64(_MERSENNE)
                sigs.append(vals.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({"id": pdf[id_col], "signature": sigs})

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        lambda it: run(it), f"id {df.schema[id_col].dataType.simpleString()}, signature array<long>"
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from LSH banding."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    band_cols = [
        F.xxhash64(
            F.lit(bi),
            *[F.col("signature")[bi * rows_per_band + r] for r in range(rows_per_band)],
        ).alias("bh")
        for bi in range(bands)
    ]
    banded = sig.select(
        "id", F.explode(F.array(*[F.struct(F.lit(bi).alias("band"), bc) for bi, bc in
                                  enumerate(band_cols)])).alias("x")
    ).select("id", F.col("x.band").alias("band"), F.col("x.bh").alias("bh"))
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.collect_list("id").alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket_size))
    )

    pair_schema = "id_a long, id_b long"

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_a, out_b = [], []
            for ids in pdf["ids"]:
                ids = sorted(set(ids))
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        out_a.append(ids[i])
                        out_b.append(ids[j])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return buckets.select("ids").mapInPandas(pairs, pair_schema).dropDuplicates()


def verify_jaccard(
    candidates: DataFrame, df: DataFrame, id_col: str, text_col: str,
    shingle_k: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (joins texts back, computes in
    an Arrow pass). Returns pairs with jaccard ≥ threshold."""
    texts = df.select(F.col(id_col).alias("jid"), F.col(text_col).alias("jtext"))
    joined = (
        candidates.join(texts, candidates["id_a"] == texts["jid"])
        .select("id_a", "id_b", F.col("jtext").alias("text_a"))
        .join(texts, F.col("id_b") == texts["jid"])
        .select("id_a", "id_b", "text_a", F.col("jtext").alias("text_b"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jac = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                sa = set(_shingle_hashes(ta or "", shingle_k).tolist())
                sb = set(_shingle_hashes(tb or "", shingle_k).tolist())
                u = len(sa | sb)
                jac.append(len(sa & sb) / u if u else 0.0)
            out = pdf[["id_a", "id_b"]].copy()
            out["jaccard"] = jac
            yield out

    verified = joined.mapInPandas(run, "id_a long, id_b long, jaccard double")
    return verified.where(F.col("jaccard") >= threshold)
