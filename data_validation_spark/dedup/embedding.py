"""Embedding-cosine near-duplicate detection.

Baseline: all-pairs cosine above threshold (self-join; only viable at modest
n). Scale path: random-hyperplane LSH — sign-bucket the vectors with ``bits``
random hyperplanes, equi-join within buckets (one shuffle), verify cosine
exactly inside buckets. Multi-probe via ``num_tables`` independent tables.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _cosine_expr(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_pairs_bruteforce(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    bits: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Random-hyperplane LSH bucketing, then exact cosine verify per bucket."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_tables, bits, dim)).astype(np.float32)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float32)
            ids_out, tbl_out, sig_out, vec_out = [], [], [], []
            if len(vecs):
                for t in range(num_tables):
                    proj = vecs @ planes[t].T  # (n, bits)
                    sigs = ((proj > 0).astype(np.uint64) << np.arange(bits, dtype=np.uint64)).sum(
                        axis=1
                    )
                    ids_out.extend(pdf[id_col].tolist())
                    tbl_out.extend([t] * len(vecs))
                    sig_out.extend(sigs.astype(np.int64).tolist())
                    vec_out.extend(pdf[vec_col].tolist())
            yield pd.DataFrame({"id": ids_out, "tbl": tbl_out, "sig": sig_out, "vec": vec_out})

    buckets = df.select(id_col, vec_col).mapInPandas(
        bucketize, f"id long, tbl int, sig long, vec array<float>"
    )

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2 or n > max_bucket_size:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        vecs = np.array(pdf["vec"].tolist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        ids = pdf["id"].to_numpy()
        ia, ib = np.triu_indices(n, k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia[mask]], ids[ib[mask]]),
                "id_b": np.maximum(ids[ia[mask]], ids[ib[mask]]),
                "cosine": sims[ia, ib][mask].astype(np.float64),
            }
        )

    pairs = buckets.groupBy("tbl", "sig").applyInPandas(
        verify, "id_a long, id_b long, cosine double"
    )
    return pairs.dropDuplicates(["id_a", "id_b"])
