"""The statistics engine — TFDV's ``GenerateStatistics`` re-architected for Spark.

Execution shape (cf. SURVEY.md §3.1 "Spark shape"):

1. **Wide pass** — one ``df.groupBy(slice_key).agg(*exprs)`` computing every
   built-in-expressible statistic for every column in a single scan: counts,
   presence, valency, min/max/mean/stddev (NaN-excluded), zero/NaN/±inf
   counts, approximate quantile grids, string/bytes lengths. Entirely JVM-side
   (whole-stage codegen, partial+final hash agg — the reference's combiner
   fusion and hot-key fanout are what Spark's partial aggregation already does).

2. **Long pass** — a stacked ``(slice, feature, value)`` projection feeding one
   groupBy shuffle for exact top-k / unique counts (the reference's
   ``top_k_uniques_stats_generator``) and numeric stats of array elements.

3. **Assembly** — driver-side transform of the tiny aggregate output into the
   ``DatasetStatsList`` artifact (histogram math in ``quantiles.py``).

With ``options.use_sketches=True`` the long pass is replaced by a single
Arrow-vectorized sketch pass (t-digest + count-min + HLL), mergeable
accumulators combined tree-wise — see ``sketches/runner.py``.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_validation_spark.stats import exprs as E
from data_validation_spark.stats.options import StatsOptions
from data_validation_spark.stats.quantiles import (
    equi_width_histogram,
    median_from_boundaries,
    quantiles_histogram,
)
from data_validation_spark.stats.result import (
    BytesStats,
    CommonStats,
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
    NumericStats,
    PresenceAndValency,
    RankBucket,
    StringStats,
)

_QUANTILE_CUTS = 100  # fine grid size; 10× the default 10 histogram buckets

# Test hook: when True, _run_long_pass records its fused union frame in
# _last_union_frame for plan assertions. Off by default — retaining the
# frame would pin its lineage (and the source DataFrame) in module state
# for the life of a long-running driver.
CAPTURE_UNION_FRAME = False
_last_union_frame = None


def compute_statistics(df: DataFrame, options: Optional[StatsOptions] = None) -> DatasetStatsList:
    """Compute the full statistics artifact for ``df``."""
    options = options or StatsOptions()
    # Per-feature weight overrides (ExampleWeightMap): weight_arg carries the
    # map into the expression builders; plain weight_column otherwise.
    weight_map = options.example_weight_map
    weight_arg = weight_map if weight_map is not None else options.weight_column
    weight_cols = (
        sorted(weight_map.all_weight_features())
        if weight_map is not None
        else ([options.weight_column] if options.weight_column else [])
    )

    if options.feature_allowlist:
        keep = list(options.feature_allowlist)
        extra = [c for c in (*weight_cols, options.slice_column) if c and c not in keep]
        df = df.select(*(keep + extra))
    if options.sample_rate is not None and options.sample_rate < 1.0:
        df = df.sample(fraction=options.sample_rate, seed=42)

    if options.slice_specs:
        # Multi-slicer / value-set slicing: explode rows into every slice they
        # belong to (one expression + one explode; slicing_util.py parity).
        from data_validation_spark.stats.slicing import apply_slicing

        df = apply_slicing(df, options.slice_specs, options.default_slice_key)
        slice_col = F.col("__slice_key__")
    else:
        slice_col = (
            F.col(options.slice_column).cast("string")
            if options.slice_column
            else F.lit(options.default_slice_key)
        )
    stat_cols = [
        f.name
        for f in df.schema.fields
        if f.name not in (*weight_cols, options.slice_column, "__slice_key__")
    ]
    plans = E.classify_columns(
        df.select(*stat_cols).schema, options.categorical_features
    )
    for p in plans:
        if p.categorical:
            p.categorical = _want_topk(p, options)
        if p.name in options.image_columns and p.stats_type == E.BYTES:
            p.image_stats = True

    # ---- wide + long passes, submitted concurrently ------------------------
    # The two jobs are independent; overlapping them lets Spark's scheduler
    # interleave their stages (fills the cluster while either job's final
    # single-reducer stage runs) and hides per-job fixed overhead.
    from concurrent.futures import ThreadPoolExecutor

    agg_exprs, quant_exprs, bytes_exprs = E.build_agg_exprs(
        plans,
        weight_arg,
        _QUANTILE_CUTS,
        options.quantiles_accuracy,
        options.num_values_histogram_buckets,
        # sketch mode computes quantiles via t-digest in the sketch pass
        include_quantiles=not options.use_sketches,
    )

    def wide_job():
        return df.groupBy(slice_col.alias("slice_key")).agg(*agg_exprs).collect()

    def quant_job():
        # percentile_approx grids can't share the wide agg: they'd force it
        # into ObjectHashAggregate (no codegen). SKETCH mode runs them as
        # their own column-pruned job (num-values histograms only — the
        # quantile grids ride the sketch pass); EXACT mode folds them into
        # the fused long union instead (see _run_long_pass).
        if not quant_exprs or not options.use_sketches:
            return []
        return df.groupBy(slice_col.alias("slice_key")).agg(*quant_exprs).collect()

    def bytes_job():
        # ALL binary-column stats (presence, lengths, HLL unique, format
        # sniff) run as their own concurrent job over a codegen'd projection
        # of the payload (see exprs.build_agg_exprs docstring): the
        # imperative HLL would disable codegen in the wide agg, and with the
        # binary stats isolated the wide agg's scan skips the binary column
        # entirely — each column is still read exactly once across the pass.
        if not bytes_exprs:
            return []
        projs = [pe for proj, _ in bytes_exprs for pe in proj]
        aggs = [ae for _, agg in bytes_exprs for ae in agg]
        src = df.select(slice_col.alias("slice_key"), *projs)
        return src.groupBy("slice_key").agg(*aggs).collect()

    def long_job():
        if options.use_sketches:
            from data_validation_spark.stats.sketches.runner import run_sketch_pass

            return (*run_sketch_pass(df, plans, slice_col, options), {}, {})
        # Exact mode: top-k/uniques + array-element stats + percentile grids
        # + (when a weight column is set) weighted t-digest quantiles, all
        # in ONE action — see _run_long_pass.
        return _run_long_pass(df, plans, slice_col, options, quant_exprs,
                              weight_arg=weight_arg)

    def custom_gen_job():
        # User-defined generators (StatsOptions.generators) — their combiner
        # pass and any transform generators run as additional concurrent
        # jobs; outputs merge into the artifact per slice after assembly.
        if not options.generators:
            return {}
        from data_validation_spark.generators import (
            CombinerFeatureStatsGenerator,
            CombinerStatsGenerator,
            TransformStatsGenerator,
            run_combiner_generators,
        )

        combiners = [
            g
            for g in options.generators
            if isinstance(g, (CombinerStatsGenerator, CombinerFeatureStatsGenerator))
        ]
        per_slice = run_combiner_generators(
            df,
            combiners,
            slice_col=slice_col,
            stat_cols=stat_cols,
            default_slice_key=options.default_slice_key,
        ) if combiners else {}
        for g in options.generators:
            if isinstance(g, TransformStatsGenerator):
                for sk, ds in g.apply(df).items():
                    per_slice.setdefault(sk, []).append((g.name, ds))
        return per_slice

    def lift_job():
        # Label-driven lift (StatsOptions.label_feature → per-feature "lift"
        # custom stats; stats_impl.py:386-396). All categorical x melt into
        # one stack so the table is scanned once.
        label = options.label_feature
        if not label:
            return []
        if label not in df.columns:
            raise ValueError(f"label_feature {label!r} not found in the data.")
        from pyspark.sql import types as T

        label_type = df.schema[label].dataType
        label_is_categorical = label in options.categorical_features or isinstance(
            label_type, (T.StringType, T.BooleanType, T.BinaryType)
        )
        if not label_is_categorical and not options.lift_y_boundaries:
            raise ValueError(
                f"label_feature {label!r} is numeric; lift needs "
                "lift_y_boundaries (the reference LiftStatsGenerator's "
                "y_boundaries requirement)."
            )
        x_cols = [
            p.name
            for p in plans
            if p.categorical
            and p.name != label
            and not isinstance(df.schema[p.name].dataType, T.ArrayType)
        ]
        if not x_cols:
            return []
        from data_validation_spark.stats.lift import lift_stats_multi

        return lift_stats_multi(
            df,
            x_cols,
            label,
            slice_col=slice_col,
            weight_col=options.weight_column,
            y_boundaries=options.lift_y_boundaries,
        ).collect()

    with ThreadPoolExecutor(max_workers=6) as pool:
        wide_f = pool.submit(wide_job)
        quant_f = pool.submit(quant_job)
        bytes_f = pool.submit(bytes_job)
        long_f = pool.submit(long_job)
        gen_f = pool.submit(custom_gen_job)
        lift_f = pool.submit(lift_job)
        wide_rows = wide_f.result()
        quant_rows = quant_f.result()
        bytes_rows = bytes_f.result()
        (topk_data, uniq_data, arr_data, wtopk_data, wq_data,
         quant_long) = long_f.result()
        custom_gen_out = gen_f.result()
        lift_rows = lift_f.result()

    if not wide_rows:
        # Placeholder-for-empty-input parity (stats_impl.py:141-158).
        return DatasetStatsList([DatasetStats(options.default_slice_key, 0, features={})])

    quant_by_slice = {r["slice_key"]: r.asDict() for r in quant_rows}
    for r in bytes_rows:  # binary-column stats, keyed by the same aliases
        quant_by_slice.setdefault(r["slice_key"], {}).update(r.asDict())
    for sk, grids in quant_long.items():  # exact mode: grids from the union
        quant_by_slice.setdefault(sk, {}).update(grids)

    # ---- assembly ----------------------------------------------------------
    slices = []
    for row in wide_rows:
        rd = row.asDict()
        rd.update(quant_by_slice.get(rd["slice_key"], {}))
        slices.append(
            _assemble_slice(
                rd, plans, options, topk_data, uniq_data, arr_data, wtopk_data, wq_data
            )
        )
    slices.sort(key=lambda s: s.slice_key)
    artifact = DatasetStatsList(slices)
    if custom_gen_out:
        from data_validation_spark.generators import merge_generator_output

        artifact = merge_generator_output(artifact, custom_gen_out)
    if lift_rows:
        by_slice_feature: dict = {}
        for r in lift_rows:
            by_slice_feature.setdefault((r["slice_key"], r["x_feature"]), []).append(
                {
                    "y": r["y"],
                    "x": r["x"],
                    "lift": float(r["lift"]),
                    "xy_count": r["xy_count"],
                    "x_count": r["x_count"],
                    "y_rate": float(r["y_rate"]),
                }
            )
        for s in artifact.slices:
            for name, fs in s.features.items():
                series = by_slice_feature.get((s.slice_key, name))
                if series:
                    # reference LiftSeries ordering: per y, lift desc then x
                    # desc (two stable sorts — x is a string, can't negate)
                    series.sort(key=lambda d: d["x"], reverse=True)
                    series.sort(key=lambda d: (d["y"], -d["lift"]))
                    fs.custom["lift"] = series
    return artifact


def _want_topk(p: E.ColumnPlan, options: StatsOptions) -> bool:
    return p.stats_type == E.STRING or p.name in options.categorical_features


def _run_long_pass(df, plans, slice_col, options: StatsOptions, quant_exprs=None,
                   weight_arg=None):
    """Exact top-k/uniques + array-element numeric stats + percentile grids
    + (when a weight column is configured) weighted t-digest quantiles —
    ONE Spark action.

    Each concern builds a small (KB-scale) lazy result frame; their union is
    collected once. Catalyst compiles the union into column-disjoint
    parquet scans — categorical columns for top-k, nested numeric columns
    for array stats, scalar numeric columns for the percentile grids,
    numeric + weight columns for the weighted digests (plan-asserted in
    tests/test_plans.py) — so the long pass reads each table column at most
    once and exact mode submits exactly TWO jobs (wide agg + this union).
    Round 4 ran the weighted digest and the percentile grids as separate
    concurrent jobs; at 100 TB each was an extra scan wave. The grid branch
    is the only ObjectHashAggregate (percentile_approx) and it is isolated
    in its own union branch, so the other branches keep WholeStageCodegen."""
    long_df = E.long_format(
        df, plans, slice_col,
        weight_arg if weight_arg is not None else options.weight_column,
    )
    topk_data: dict = {}
    uniq_data: dict = {}
    arr_data: dict = {}
    wtopk_data: dict = {}
    wq_data: dict = {}
    quant_long: dict = {}
    finals = []

    any_topk = long_df is not None and any(p.categorical for p in plans)
    any_arr = long_df is not None and any(
        p.numeric and p.nest_depth > 0 for p in plans
    )
    weighted = bool(options.weight_column)
    k = max(options.num_top_values, options.num_rank_histogram_buckets)

    if any_topk:
        counts = (
            long_df.where(F.col("str_value").isNotNull())
            .groupBy("slice_key", "feature", "str_value")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("weight").alias("wcnt"))
        )
        # Exact two-phase salted top-k: a single window over (slice, feature)
        # sorts every distinct value in ONE task per feature — a straggler at
        # high cardinality. Phase A ranks within (slice, feature, salt) so the
        # heavy sort spreads over `salts` tasks per feature and also carries
        # each salt bucket's distinct-count; phase B ranks the ≤ salts×k
        # survivors. Exact: the global top-k of a salt bucket's values is in
        # that bucket's local top-k, and salt buckets partition the distinct
        # values so their sizes sum to the exact unique count.
        salts = 16
        salt = F.pmod(F.xxhash64("str_value"), F.lit(salts))
        # With a weight column the reference emits BOTH an unweighted top-k
        # (string_stats.top_values) and a weighted one ranked by weighted
        # frequency (weighted_string_stats) — so rank by both orderings in
        # the same pass (same shuffle partitioning, two sorts) and keep any
        # row in either top-k. Tie-break parity: larger value wins.
        wa = Window.partitionBy("slice_key", "feature", "salt").orderBy(
            F.desc("cnt"), F.desc("str_value")
        )
        wa_cnt = Window.partitionBy("slice_key", "feature", "salt")
        local = counts.withColumn("salt", salt).withColumn(
            "r", F.row_number().over(wa)
        )
        keep = F.col("r") <= k
        if weighted:
            wa_w = Window.partitionBy("slice_key", "feature", "salt").orderBy(
                F.desc("wcnt"), F.desc("str_value")
            )
            local = local.withColumn("rw", F.row_number().over(wa_w))
            keep = keep | (F.col("rw") <= k)
        local = local.withColumn("u", F.count(F.lit(1)).over(wa_cnt)).where(keep)
        wb = Window.partitionBy("slice_key", "feature").orderBy(
            F.desc("cnt"), F.desc("str_value")
        )
        wb_all = Window.partitionBy("slice_key", "feature")
        final = local.withColumn("rank", F.row_number().over(wb)).withColumn(
            "unique",
            F.sum(F.when(F.col("r") == 1, F.col("u")).otherwise(0)).over(wb_all),
        )
        if weighted:
            wb_w = Window.partitionBy("slice_key", "feature").orderBy(
                F.desc("wcnt"), F.desc("str_value")
            )
            final = final.withColumn("wrank", F.row_number().over(wb_w))
            final = final.where((F.col("rank") <= k) | (F.col("wrank") <= k))
        else:
            final = final.withColumn(
                "wrank", F.lit(None).cast("int")
            ).where(F.col("rank") <= k)
        finals.append(
            final.select(
                F.lit("topk").alias("kind"), "slice_key", "feature",
                "str_value", "cnt", "wcnt", "rank", "wrank", "unique",
            )
        )

    if any_arr:
        qs = [i / _QUANTILE_CUTS for i in range(_QUANTILE_CUTS + 1)]
        nv = F.col("num_value")
        finite = F.when(~nv.isin(float("inf"), float("-inf")), nv)
        finals.append(
            long_df.where(nv.isNotNull())
            .groupBy("slice_key", "feature")
            .agg(
                F.min(nv).alias("min"),
                F.max(nv).alias("max"),
                # non-NaN values including ±inf — reference accumulator
                # semantics (basic_stats_generator.py:434-444); NaNs never
                # reach the long frame (stripped in long_format)
                F.avg(nv).alias("mean"),
                F.stddev_pop(nv).alias("std"),
                F.sum(F.when(nv == 0.0, 1).otherwise(0)).alias("zeros"),
                F.sum(F.when(nv == float("inf"), 1).otherwise(0)).alias("posinf"),
                F.sum(F.when(nv == float("-inf"), 1).otherwise(0)).alias("neginf"),
                F.min(finite).alias("finmin"),
                F.max(finite).alias("finmax"),
                F.count(finite).alias("fincnt"),
                F.percentile_approx(finite, qs, options.quantiles_accuracy).alias("quants"),
            )
            .select(F.lit("arr").alias("kind"), "*")
        )

    from data_validation_spark.stats.sketches.runner import (
        build_weighted_digest_frame,
        decode_weighted_digest,
    )

    if weighted:
        wq_frame = build_weighted_digest_frame(df, plans, slice_col, options,
                                               weight_arg=weight_arg)
        if wq_frame is not None:
            finals.append(
                wq_frame.select(
                    F.lit("wacc").alias("kind"), "slice_key", "feature", "acc"
                )
            )

    if quant_exprs:
        # percentile-grid branch: per-slice wide agg exploded to long
        # (slice_key, feature=alias__stat, quants=grid) so it unions with
        # the other result frames; scan pruned to the scalar numeric columns.
        qagg = df.groupBy(slice_col.alias("slice_key")).agg(*quant_exprs)
        qcols = [c for c in qagg.columns if c != "slice_key"]
        stacked = F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("feature"), F.col(c).alias("quants"))
                    for c in qcols
                ]
            )
        )
        finals.append(
            qagg.select(
                F.lit("qgrid").alias("kind"), "slice_key", stacked.alias("p")
            ).select("kind", "slice_key", "p.feature", "p.quants")
        )

    if not finals:
        return topk_data, uniq_data, arr_data, wtopk_data, wq_data, quant_long

    out = finals[0]
    for f in finals[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    if CAPTURE_UNION_FRAME:
        global _last_union_frame
        _last_union_frame = out
    for r in out.collect():
        key = (r["slice_key"], r["feature"])
        if r["kind"] == "topk":
            if r["rank"] <= k:
                topk_data.setdefault(key, []).append(
                    (r["rank"], r["str_value"], r["cnt"], r["wcnt"])
                )
            if weighted and r["wrank"] <= k:
                wtopk_data.setdefault(key, []).append(
                    (r["wrank"], r["str_value"], r["cnt"], r["wcnt"])
                )
            uniq_data[key] = r["unique"]
        elif r["kind"] == "arr":
            arr_data[key] = r.asDict()
        elif r["kind"] == "qgrid":
            # feature holds the wide-agg alias (e.g. "c3__quants")
            quant_long.setdefault(r["slice_key"], {})[r["feature"]] = r["quants"]
        else:  # wacc
            wq_data[key] = decode_weighted_digest(r["acc"])

    return topk_data, uniq_data, arr_data, wtopk_data, wq_data, quant_long


def _assemble_slice(
    rd, plans, options: StatsOptions, topk_data, uniq_data, arr_data, wtopk_data=None,
    wq_data=None,
):
    slice_key = rd["slice_key"]
    num_examples = rd["num_examples"]
    ds = DatasetStats(
        slice_key=slice_key,
        num_examples=num_examples,
        weighted_num_examples=rd.get("weighted_num_examples"),
    )
    for p in plans:
        ds.features[p.name] = _assemble_feature(
            p, rd, num_examples, slice_key, options, topk_data, uniq_data, arr_data,
            wtopk_data or {}, wq_data or {},
        )
    return ds


def _g(rd, p, stat, default=None):
    v = rd.get(f"{p.alias}__{stat}")
    return default if v is None else v


def _assemble_feature(
    p, rd, num_examples, slice_key, options, topk_data, uniq_data, arr_data,
    wtopk_data=None, wq_data=None,
):
    fs = FeatureStats(name=p.name, type=p.stats_type)
    if p.source_type and p.source_type not in ("LONG", "DOUBLE", "STRING", "BINARY"):
        fs.custom["source_type"] = p.source_type

    nonmissing = int(_g(rd, p, "nonmissing", 0))
    common = CommonStats(
        num_non_missing=nonmissing,
        num_missing=num_examples - nonmissing,
    )
    fs.common = common
    if options.weight_column:
        common.weighted_num_non_missing = _g(rd, p, "w_nonmissing", 0.0) or 0.0
        # overridden features (ExampleWeightMap) carry their own weight
        # total; others subtract from the dataset-level global-weight total
        total_w = _g(rd, p, "w_total")
        if total_w is None:
            total_w = rd.get("weighted_num_examples") or 0.0
        common.weighted_num_missing = total_w - common.weighted_num_non_missing

    if p.stats_type in (E.STRUCT, E.UNKNOWN):
        if p.stats_type == E.STRUCT and p.nest_depth == 0 and nonmissing > 0:
            # A present scalar struct counts as one value (reference TFXIO
            # StructuredTensor semantics; the sequence-e2e golden's
            # ##SEQUENCE## feature carries value_count {min:1 max:1}).
            common.min_num_values = 1
            common.max_num_values = 1
            common.avg_num_values = 1.0
            common.tot_num_values = nonmissing
        return fs

    if p.nest_depth == 0:
        if nonmissing > 0:
            common.min_num_values = 1
            common.max_num_values = 1
            common.avg_num_values = 1.0
            common.tot_num_values = nonmissing
    else:
        common.min_num_values = int(_g(rd, p, "minvals", 0) or 0)
        common.max_num_values = int(_g(rd, p, "maxvals", 0) or 0)
        common.tot_num_values = int(_g(rd, p, "totvals", 0) or 0)
        common.avg_num_values = common.tot_num_values / nonmissing if nonmissing else 0.0
        if p.nest_depth >= 2:
            common.presence_and_valency = [
                PresenceAndValency(
                    num_non_missing=int(_g(rd, p, f"l{lvl}_nlists", 0) or 0),
                    min_num_values=int(_g(rd, p, f"l{lvl}_minvals", 0) or 0),
                    max_num_values=int(_g(rd, p, f"l{lvl}_maxvals", 0) or 0),
                    tot_num_values=int(_g(rd, p, f"l{lvl}_totvals", 0) or 0),
                )
                for lvl in range(1, p.nest_depth + 1)
            ]
        vh = _g(rd, p, "valshist")
        if vh is not None:
            common.num_values_histogram = quantiles_histogram(
                vh, nonmissing, options.num_values_histogram_buckets
            )

    key = (slice_key, p.name)

    if p.numeric:
        if p.nest_depth == 0:
            num = NumericStats(
                mean=_g(rd, p, "mean", 0.0) or 0.0,
                std_dev=_std0(_g(rd, p, "std", 0.0)),
                min=_nn(_g(rd, p, "min")),
                max=_nn(_g(rd, p, "max")),
                num_zeros=int(_g(rd, p, "zeros", 0) or 0),
                num_nan=int(_g(rd, p, "nan", 0) or 0),
                num_pos_inf=int(_g(rd, p, "posinf", 0) or 0),
                num_neg_inf=int(_g(rd, p, "neginf", 0) or 0),
            )
            num.finite_min = _g(rd, p, "finmin", num.min if math.isfinite(num.min) else None)
            num.finite_max = _g(rd, p, "finmax", num.max if math.isfinite(num.max) else None)
            quants = _g(rd, p, "quants")
            finite_count = nonmissing - num.num_nan - num.num_pos_inf - num.num_neg_inf
            if quants is None and key in arr_data:  # sketch mode: t-digest quantiles
                quants = arr_data[key]["quants"]
            if options.weight_column:
                w_cnt = _g(rd, p, "w_cnt", 0.0) or 0.0
                w_sum = _g(rd, p, "w_sum", 0.0) or 0.0
                w_sumsq = _g(rd, p, "w_sumsq", 0.0) or 0.0
                if w_cnt > 0:
                    num.weighted_mean = w_sum / w_cnt
                    # max(0, var) with 0 FIRST: max(0.0, nan) is 0.0, so a
                    # nan variance (infinities present) collapses to std 0.0
                    # — sqrt(max(0, variance)) reference semantics
                    # (basic_stats_generator.py:787).
                    var = max(0.0, w_sumsq / w_cnt - num.weighted_mean**2)
                    num.weighted_std_dev = math.sqrt(var)
        else:
            a = arr_data.get(key)
            exact_nan = _g(rd, p, "nan")  # wide-pass NaN counter (float nests)
            if a is None:
                if exact_nan:
                    # all values were NaN: no rows reached the long frame but
                    # the reference still emits num_stats carrying the NaN
                    # count (basic_stats_generator test_only_nan)
                    fs.numeric = NumericStats(num_nan=int(exact_nan))
                return fs
            num = NumericStats(
                mean=a["mean"] or 0.0,
                std_dev=_std0(a["std"]),
                min=_nn(a["min"]),
                max=_nn(a["max"]),
                num_zeros=int(a["zeros"] or 0),
                num_pos_inf=int(a["posinf"] or 0),
                num_neg_inf=int(a["neginf"] or 0),
            )
            num.finite_min = a["finmin"]
            num.finite_max = a["finmax"]
            if exact_nan is not None:
                num.num_nan = int(exact_nan)
            else:
                # NaNs never reach the long frame (stripped in long_format);
                # count = tot - finite - infs.
                num.num_nan = max(
                    common.tot_num_values - int(a["fincnt"]) - num.num_pos_inf - num.num_neg_inf, 0
                )
            quants = a["quants"]
            finite_count = int(a["fincnt"])
        if quants is not None:
            num.median = median_from_boundaries(quants)
            qh = quantiles_histogram(
                quants, finite_count, options.num_quantiles_histogram_buckets, num.num_nan
            )
            eh = equi_width_histogram(
                quants,
                finite_count,
                options.num_histogram_buckets,
                num.num_nan,
                num.num_pos_inf,
                num.num_neg_inf,
            )
            num.histograms = [h for h in (eh, qh) if h is not None]
        # Weighted quantile stats (reference WeightedNumericStatistics median +
        # [weighted equi-width, weighted quantiles] histograms,
        # basic_stats_generator.py:838-876) — emitted when a weight column is
        # configured and the sketch pass produced a weighted t-digest grid.
        wdata = None
        if options.weight_column:
            # sketch mode: weighted grid lives in arr_data; exact mode: in
            # the dedicated weighted-quantile pass output
            wdata = (wq_data or {}).get(key) or arr_data.get(key)
        if wdata and wdata.get("wquants") is not None:
            wq = wdata["wquants"]
            wfin = wdata["wfcnt"]
            num.weighted_median = median_from_boundaries(wq)
            wqh = quantiles_histogram(
                wq, wfin, options.num_quantiles_histogram_buckets, num.num_nan
            )
            weh = equi_width_histogram(
                wq,
                wfin,
                options.num_histogram_buckets,
                num.num_nan,
                wdata["wposinf"],
                wdata["wneginf"],
            )
            num.weighted_histograms = [h for h in (weh, wqh) if h is not None]
            if num.weighted_mean is None:
                # Nested features: weighted mean/std from the sketch
                # accumulators (the wide pass only covers scalars). Same
                # ±inf reconstruction as the unweighted path above.
                wn = wfin + wdata["wposinf"] + wdata["wneginf"]
                if wdata["wposinf"] and wdata["wneginf"]:
                    num.weighted_mean = float("nan")
                elif wdata["wposinf"]:
                    num.weighted_mean = float("inf")
                elif wdata["wneginf"]:
                    num.weighted_mean = float("-inf")
                elif wn > 0:
                    num.weighted_mean = wdata["wfsum"] / wn
                if num.weighted_mean is not None:
                    if wdata["wposinf"] or wdata["wneginf"]:
                        wvar = 0.0
                    else:
                        wvar = max(
                            0.0,
                            wdata["wfsumsq"] / wn - num.weighted_mean**2,
                        ) if wn > 0 else 0.0
                    num.weighted_std_dev = math.sqrt(wvar)
        fs.numeric = num
        if not p.categorical:
            return fs

    if p.categorical or p.stats_type == E.STRING:
        avglen = _g(rd, p, "avglen")
        if avglen is None:
            # multivalent string/categorical features: avg element length
            # from the wide pass's (lensum, lencnt) pair
            lensum, lencnt = _g(rd, p, "lensum", 0) or 0, _g(rd, p, "lencnt", 0) or 0
            avglen = lensum / lencnt if lencnt else 0.0
        st = StringStats(avg_length=avglen)
        st.unique = int(uniq_data.get(key, 0))  # unique is NOT thresholded
        entries = sorted(topk_data.get(key, []))
        if options.frequency_threshold > 1:
            entries = [e for e in entries if e[2] >= options.frequency_threshold]
        st.top_values = [
            (v, float(c)) for (_, v, c, _wc) in entries[: options.num_top_values]
        ]
        st.rank_histogram = [
            RankBucket(r, r, v, float(c))
            for (r, v, c, _wc) in entries[: options.num_rank_histogram_buckets]
        ]
        if options.weight_column and wtopk_data is not None:
            # weighted_string_stats parity: a second top-k ranked by weighted
            # frequency, reporting weighted counts.
            wentries = sorted(wtopk_data.get(key, []))
            if options.weighted_frequency_threshold > 1.0:
                wentries = [
                    e
                    for e in wentries
                    if e[3] is not None
                    and e[3] >= options.weighted_frequency_threshold
                ]
            st.weighted_top_values = [
                (v, float(wc)) for (_, v, _c, wc) in wentries[: options.num_top_values]
            ]
            st.weighted_rank_histogram = [
                RankBucket(r, r, v, float(wc))
                for (r, v, _c, wc) in wentries[: options.num_rank_histogram_buckets]
            ]
        fs.string = st
        return fs

    if p.stats_type == E.BYTES:
        fs.bytes = BytesStats(
            unique=int(_g(rd, p, "unique", 0) or 0),
            avg_num_bytes=_g(rd, p, "avglen", 0.0) or 0.0,
            min_num_bytes=float(_g(rd, p, "minbytes", 0) or 0),
            max_num_bytes=float(_g(rd, p, "maxbytes", 0) or 0),
        )
        if p.image_stats:
            hist = {
                label: int(_g(rd, p, f"imgfmt_{label}", 0) or 0)
                for label in ("png", "jpeg", "gif", "bmp", "UNKNOWN")
            }
            hist = {k: v for k, v in hist.items() if v > 0}
            fs.custom["image_format_histogram"] = hist
            total = sum(hist.values())
            supported = total - hist.get("UNKNOWN", 0)
            # domain inference thresholds: ≥80% supported over ≥100 values
            if total >= 100 and supported / total >= 0.8:
                fs.custom["domain_info"] = "image_domain {}"
    return fs


def _nn(v, default=0.0):
    return default if v is None else float(v)


def _std0(v):
    """std_dev = sqrt(max(0, variance)) reference semantics
    (basic_stats_generator.py:787): with infinities in the accumulator the
    variance is nan and max(0, nan) is 0 — so a nan stddev collapses to 0.0."""
    if v is None:
        return 0.0
    v = float(v)
    return 0.0 if math.isnan(v) else v
