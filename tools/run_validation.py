"""spark-submit entrypoint for the validation engine.

Usage:
    spark-submit --py-files dist/data_validation_spark.zip \
        tools/run_validation.py --input /path/to/images_parquet \
        [--schema schema.json] [--prev-stats stats.json] \
        [--ledger /path/ledger] [--partition-col date] \
        [--output /path/out] [--check-pixels] [--pixel-sample 0.05]

Runs the full stats + constraint + row-level pass; with ``--partition-col``
each distinct partition value validates separately through the checkpoint
ledger (resume-safe). Exit code 0 = validation passed, 2 = anomalies found.

Build the py-files archive with: python tools/make_pyfiles.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or iceberg table")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--schema", help="schema JSON path (default: infer + validate)")
    ap.add_argument("--prev-stats", help="previous-span stats JSON for drift")
    ap.add_argument("--ledger", help="checkpoint ledger dir (enables resume)")
    ap.add_argument("--partition-col", help="validate per distinct value of this column")
    ap.add_argument("--output", help="directory for stats/anomalies artifacts")
    ap.add_argument("--check-pixels", action="store_true")
    ap.add_argument("--pixel-sample", type=float, default=0.05)
    ap.add_argument("--use-sketches", action="store_true")
    ap.add_argument(
        "--snapshot-id",
        type=int,
        help="iceberg: validate this snapshot (pins resume to a table state)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_validation_spark.io.artifacts import load_stats, save_stats
    from data_validation_spark.pipeline import default_image_schema, validate_images
    from data_validation_spark.schema import Schema
    from data_validation_spark.session import get_spark
    from data_validation_spark.stats.options import StatsOptions
    from data_validation_spark.validate.infer import infer_schema

    # Under spark-submit the pre-built session wins (getOrCreate); run
    # standalone, get_spark's local defaults (AQE, Arrow, memory) apply.
    spark = get_spark("data-validation-spark")

    if args.format == "iceberg":
        from data_validation_spark.sources import read_iceberg

        df = read_iceberg(spark, args.input, snapshot_id=args.snapshot_id)
    else:
        df = spark.read.parquet(args.input)

    schema = Schema.from_json(open(args.schema).read()) if args.schema else None
    prev = load_stats(args.prev_stats) if args.prev_stats else None
    options = StatsOptions(
        categorical_features={"fmt"} if "fmt" in df.columns else set(),
        use_sketches=args.use_sketches,
    )

    if args.format == "iceberg" and args.ledger and not args.partition_col:
        # North-rule path: one ledger entry per ICEBERG partition, partitions
        # enumerated from manifest metadata (no data scan), per-partition
        # reads manifest-pruned, lineage pinned to the snapshot id so resume
        # validates the same table state even across appends.
        from data_validation_spark.io.checkpoint import run_iceberg_partitioned

        recs = run_iceberg_partitioned(
            spark,
            args.input,
            schema or default_image_schema(),
            args.ledger,
            snapshot_id=args.snapshot_id,
            prev_stats_for=(lambda _part: prev) if prev is not None else None,
            check_pixels=args.check_pixels,
            pixel_sample_rate=args.pixel_sample,
            options=options,
        )
        failed = [p for p, r in recs.items() if r.status != "ok"]
        print(json.dumps({"partitions_run": len(recs), "failed": failed}))
        return 2 if failed else 0

    if args.partition_col:
        from data_validation_spark.io.checkpoint import run_partitioned

        raw_parts = [
            r[0]
            for r in df.select(args.partition_col).distinct().orderBy(args.partition_col).collect()
        ]
        by_label = {("__NULL__" if p is None else str(p)): p for p in raw_parts}

        def read_part(label: str):
            v = by_label[label]
            c = F.col(args.partition_col)
            # Native-typed equality: a cast-to-string comparison would defeat
            # partition pruning on hive/Iceberg-partitioned tables (the
            # predicate must be on the raw partition column to reach
            # PartitionFilters). Asserted by tests/test_plans.py.
            return df.where(c.isNull() if v is None else c == v)

        recs = run_partitioned(
            spark,
            sorted(by_label),
            read_part,
            schema or default_image_schema(),
            args.ledger or "./_dvs_ledger",
            prev_stats_for=(lambda _part: prev) if prev is not None else None,
            check_pixels=args.check_pixels,
            pixel_sample_rate=args.pixel_sample,
            options=options,
        )
        failed = [p for p, r in recs.items() if r.status != "ok"]
        print(json.dumps({"partitions_run": len(recs), "failed": failed}))
        return 2 if failed else 0

    if schema is None:
        from data_validation_spark.stats.engine import compute_statistics

        schema = infer_schema(compute_statistics(df.limit(100_000), options))
    result = validate_images(
        spark,
        df,
        schema,
        prev_stats=prev,
        options=options,
        check_pixels=args.check_pixels,
        pixel_sample_rate=args.pixel_sample,
    )
    if args.output:
        os.makedirs(args.output, exist_ok=True)
        save_stats(result.stats, os.path.join(args.output, "stats.json"))
        with open(os.path.join(args.output, "anomalies.json"), "w") as f:
            f.write(result.anomalies.to_json())
    print(
        json.dumps(
            {
                "num_examples": result.num_examples,
                "passed": result.passed,
                "anomalies": len(result.anomalies.anomalies),
                "violation_counts": {
                    f"{k[0]}::{k[1]}": v for k, v in result.violation_counts.items()
                },
            }
        )
    )
    return 0 if result.passed else 2


if __name__ == "__main__":
    sys.exit(main())
