"""MinHash + LSH near-duplicate detection: shingle → minhash signature →
band → bucket-join → candidate pairs (→ optional exact-Jaccard verify).

Everything in the hot path is JVM-side Catalyst expressions (no per-row
Python): shingling via ``split``/``transform``/``slice``/``concat_ws``,
hashing via ``xxhash64``, and the signature as a single ``aggregate`` fold
that keeps one running minimum per permutation (each permutation is
``xxhash64(shingle_hash, seed_j)``). Banding turns the O(n²) pair search into
one groupBy shuffle on (band, band-hash) buckets; pair explosion happens
inside buckets only and hot buckets are bounded by ``max_bucket_size``.

Reference semantics: near-dup candidate generation for large text corpora
(the reference has no dedup operators; this is the LLM-pipeline extension
required by the build spec).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_MAX_LONG = (1 << 63) - 1


def shingle_array(text_col: Column, k: int) -> Column:
    """Array of k-word shingle strings of ``text_col`` (JVM expressions only).

    Texts shorter than ``k`` words yield a single shingle of all words;
    empty/whitespace-only texts yield an empty array.
    """
    words = F.filter(
        F.split(F.trim(text_col), r"\s+"), lambda w: F.length(w) > 0
    )
    n = F.size(words)
    return (
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
            ),
        )
        .when(n > 0, F.array(F.concat_ws(" ", words)))
        .otherwise(F.array().cast("array<string>"))
    )


def shingle_hash_array(text_col: Column, k: int) -> Column:
    """Distinct xxhash64 hashes of the k-word shingles (JVM-side)."""
    return F.array_distinct(
        F.transform(shingle_array(text_col, k), lambda s: F.xxhash64(s))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, shingle_k: int = 3
) -> DataFrame:
    """(id, signature array<long>) — one JVM pass, no Python in the loop.

    Permutation j of shingle-hash h is ``xxhash64(h, j)`` (an independent
    64-bit hash per seed); the signature is a single ``aggregate`` fold over
    the shingle hashes keeping the per-permutation minimum, so each shingle
    hash is computed once and the whole signature stays inside whole-stage
    codegen. Empty texts get the sentinel signature [0] * num_hashes.
    """
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(_MAX_LONG).cast("long"), num_hashes)
    hashes = shingle_hash_array(F.col(text_col), shingle_k)
    sig = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, seeds, lambda m, j: F.least(m, F.xxhash64(h, j))
        ),
    )
    # Empty docs: fold returns init (all MAX_LONG) — normalize to the 0
    # sentinel the callers/tests expect for "no content".
    sig = F.when(
        F.size(hashes) == 0, F.array_repeat(F.lit(0).cast("long"), num_hashes)
    ).otherwise(sig)
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


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
    """Exact k-word-shingle Jaccard on candidate pairs — fully JVM-side.

    Joins the (pruned, pre-shingled) texts back to the candidate pairs and
    computes |A∩B| / |A∪B| with ``array_intersect``/``array_union`` over the
    distinct shingle-string sets, so the verify stage has no Python and no
    hash-collision error. Returns pairs with jaccard ≥ threshold.
    """
    texts = df.select(
        F.col(id_col).alias("jid"),
        F.array_distinct(shingle_array(F.col(text_col), shingle_k)).alias("sh"),
    )
    joined = (
        candidates.join(texts, candidates["id_a"] == texts["jid"])
        .select("id_a", "id_b", F.col("sh").alias("sh_a"))
        .join(texts, F.col("id_b") == texts["jid"])
        .select("id_a", "id_b", "sh_a", F.col("sh").alias("sh_b"))
    )
    union_n = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(
        union_n > 0,
        F.size(F.array_intersect("sh_a", "sh_b")) / union_n.cast("double"),
    ).otherwise(F.lit(0.0))
    verified = joined.select("id_a", "id_b", jac.alias("jaccard"))
    return verified.where(F.col("jaccard") >= threshold)
