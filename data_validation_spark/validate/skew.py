"""Per-row feature skew detection between two datasets (training vs serving) —
the Spark-native reimplementation of the reference's feature-skew pipeline
(``tensorflow_data_validation/skew/feature_skew_detector.py``): join on an
identifier fingerprint, compare feature values pairwise, emit per-feature
skew counts, match stats, and a bounded sample of skewed pairs.

Spark shape: one full-outer hash join on ``xxhash64(id columns)`` (the
reference's farmhash fingerprint role), vectorized column compares, and a
single aggregation for the counters — no CoGroupByKey, no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, functions as F


@dataclass
class MatchStats:
    """Counter parity with the reference's MatchStats
    (feature_skew_detector.py MatchStats fields)."""

    base_with_id_count: int = 0
    test_with_id_count: int = 0
    identifiers_count: int = 0
    ids_missing_in_base_count: int = 0
    ids_missing_in_test_count: int = 0
    matching_pairs_count: int = 0
    duplicate_id_count_base: int = 0
    duplicate_id_count_test: int = 0


@dataclass
class FeatureSkew:
    feature: str
    base_count: int = 0
    test_count: int = 0
    match_count: int = 0
    base_only: int = 0
    test_only: int = 0
    mismatch_count: int = 0

    @property
    def diff_count(self) -> int:
        return self.base_only + self.test_only + self.mismatch_count


@dataclass
class SkewResult:
    match_stats: MatchStats
    feature_skew: dict[str, FeatureSkew] = field(default_factory=dict)
    sample_pairs: Optional[DataFrame] = None
    # (feature_name, base_value, test_value, count) rows for configured
    # confusion features (reference ConfusionCount results).
    confusion_counts: Optional[DataFrame] = None


_MISSING_VALUE_PLACEHOLDER = "__MISSING_VALUE__"


def detect_feature_skew(
    base: DataFrame,
    test: DataFrame,
    identifier_columns: list[str],
    features_to_compare: Optional[list[str]] = None,
    float_round_ndigits: Optional[int] = None,
    allow_duplicate_identifiers: bool = False,
    sample_size: int = 0,
    sample_seed: int = 42,
    confusion_features: Optional[list[str]] = None,
) -> SkewResult:
    """Compare ``base`` vs ``test`` row-by-row on fingerprinted identifiers.

    ``confusion_features``: string features for confusion analysis
    (reference ConfusionConfig, feature_skew_detector.py:350-404) — over
    matched pairs, count every (base_value, test_value) combination with
    missing values as ``__MISSING_VALUE__``; int/float features raise, as in
    the reference."""
    if features_to_compare is None:
        features_to_compare = sorted(
            (set(base.columns) & set(test.columns)) - set(identifier_columns)
        )

    # Confusion features ride along even when excluded from
    # features_to_compare — the reference's ConfusionConfig is independent of
    # the compared-feature set (feature_skew_detector.py:350-404).
    carried = list(features_to_compare)
    for c in confusion_features or []:
        if c not in base.columns or c not in test.columns:
            raise ValueError(
                f"confusion feature {c!r} must exist in both base and test"
            )
        if c not in carried:
            carried.append(c)

    fp = F.xxhash64(*[F.col(c).cast("string") for c in identifier_columns])
    b = base.select(fp.alias("__fp"), *carried)
    t = test.select(fp.alias("__fp"), *carried)

    # ONE action for everything (duplicate-id counters included): each side
    # pre-aggregates by fingerprint (map-side combined), the full-outer join
    # then runs on already-__fp-partitioned inputs (no extra Exchange), and a
    # single wide agg emits MatchStats + per-feature counts + dup counts.
    # The reference skips duplicate-id examples from the comparison
    # (feature_skew/feature_skew_detector.py semantics); here they survive as
    # a single __bn>1 / __tn>1 row that only feeds the dup counters.
    if not allow_duplicate_identifiers:

        def preagg(df):
            return df.groupBy("__fp").agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.first(c).alias(c) for c in carried],
            )

        b2 = preagg(b).withColumnRenamed("__n", "__bn")
        t2 = preagg(t).withColumnRenamed("__n", "__tn")
    else:
        b2 = b.withColumn("__bn", F.lit(1))
        t2 = t.withColumn("__tn", F.lit(1))

    def cmp_col(c):
        bc, tc = F.col(f"b.{c}"), F.col(f"t.{c}")
        if float_round_ndigits is not None and dict(base.dtypes).get(c) in ("float", "double"):
            bc, tc = F.round(bc, float_round_ndigits), F.round(tc, float_round_ndigits)
        return bc.eqNullSafe(tc)

    joined = b2.alias("b").join(t2.alias("t"), "__fp", "full_outer")
    # present-and-unique participation flags (null-safe: absent side → false)
    in_b = F.coalesce(F.col("b.__bn") == 1, F.lit(False))
    in_t = F.coalesce(F.col("t.__tn") == 1, F.lit(False))
    both = in_b & in_t

    aggs = [
        F.sum(F.when(in_b, 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(in_t, 1).otherwise(0)).alias("n_test"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_pairs"),
        F.sum(F.when(in_t & ~in_b, 1).otherwise(0)).alias("missing_base"),
        F.sum(F.when(in_b & ~in_t, 1).otherwise(0)).alias("missing_test"),
        F.sum(
            F.when(F.col("b.__bn") > 1, F.col("b.__bn")).otherwise(0)
        ).alias("dup_b"),
        F.sum(
            F.when(F.col("t.__tn") > 1, F.col("t.__tn")).otherwise(0)
        ).alias("dup_t"),
    ]
    for c in features_to_compare:
        bc, tc = F.col(f"b.{c}"), F.col(f"t.{c}")
        aggs += [
            F.sum(F.when(both & bc.isNotNull(), 1).otherwise(0)).alias(f"{c}__bcount"),
            F.sum(F.when(both & tc.isNotNull(), 1).otherwise(0)).alias(f"{c}__tcount"),
            F.sum(
                F.when(both & bc.isNotNull() & tc.isNotNull() & cmp_col(c), 1).otherwise(0)
            ).alias(f"{c}__match"),
            F.sum(
                F.when(both & bc.isNotNull() & tc.isNull(), 1).otherwise(0)
            ).alias(f"{c}__bonly"),
            F.sum(
                F.when(both & bc.isNull() & tc.isNotNull(), 1).otherwise(0)
            ).alias(f"{c}__tonly"),
            F.sum(
                F.when(both & bc.isNotNull() & tc.isNotNull() & ~cmp_col(c), 1).otherwise(0)
            ).alias(f"{c}__mismatch"),
        ]
    row = joined.agg(*aggs).collect()[0].asDict()

    ms = MatchStats(
        base_with_id_count=int(row["n_base"] or 0),
        test_with_id_count=int(row["n_test"] or 0),
        identifiers_count=int(row["n_base"] or 0)
        + int(row["missing_base"] or 0),
        ids_missing_in_base_count=int(row["missing_base"] or 0),
        ids_missing_in_test_count=int(row["missing_test"] or 0),
        matching_pairs_count=int(row["n_pairs"] or 0),
        duplicate_id_count_base=int(row["dup_b"] or 0),
        duplicate_id_count_test=int(row["dup_t"] or 0),
    )
    result = SkewResult(match_stats=ms)
    for c in features_to_compare:
        fs = FeatureSkew(
            feature=c,
            base_count=int(row[f"{c}__bcount"] or 0),
            test_count=int(row[f"{c}__tcount"] or 0),
            match_count=int(row[f"{c}__match"] or 0),
            base_only=int(row[f"{c}__bonly"] or 0),
            test_only=int(row[f"{c}__tonly"] or 0),
            mismatch_count=int(row[f"{c}__mismatch"] or 0),
        )
        if fs.base_count or fs.test_count or fs.diff_count:
            result.feature_skew[c] = fs

    if confusion_features:
        base_types = dict(base.dtypes)
        for c in confusion_features:
            if base_types.get(c) not in ("string", "binary"):
                raise ValueError(
                    f"{base_types.get(c)} features unsupported for confusion "
                    "analysis."  # int64/float parity with the reference
                )
        # one shuffle: stack per-feature (base, test) value pairs over the
        # matched rows, then a single groupBy count
        stacked = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature_name"),
                        F.coalesce(
                            F.col(f"b.{c}").cast("string"),
                            F.lit(_MISSING_VALUE_PLACEHOLDER),
                        ).alias("base_value"),
                        F.coalesce(
                            F.col(f"t.{c}").cast("string"),
                            F.lit(_MISSING_VALUE_PLACEHOLDER),
                        ).alias("test_value"),
                    )
                    for c in confusion_features
                ]
            )
        )
        result.confusion_counts = (
            joined.where(both)
            .select(stacked.alias("p"))
            .groupBy("p.feature_name", "p.base_value", "p.test_value")
            .agg(F.count(F.lit(1)).alias("count"))
        )

    if sample_size > 0:
        any_mismatch = None
        for c in features_to_compare:
            cond = both & ~cmp_col(c)
            any_mismatch = cond if any_mismatch is None else (any_mismatch | cond)
        if any_mismatch is not None:
            result.sample_pairs = (
                joined.where(any_mismatch)
                .orderBy(F.rand(sample_seed))
                .limit(sample_size)
                .select(
                    "__fp",
                    *[F.col(f"b.{c}").alias(f"base_{c}") for c in features_to_compare],
                    *[F.col(f"t.{c}").alias(f"test_{c}") for c in features_to_compare],
                )
            )
    return result
