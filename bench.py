"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship
images-validated/sec pipeline on the cached synthetic input_hint table.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "images_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMAGES_N = int(os.environ.get("SPARK_GRAFT_IMAGES_N", "400000"))

# Raw-CPU calibration (round-5, VERDICT r4 ask): this host throttles
# intermittently (same-code suite times spanned 42.6-65.6 s across round-4
# windows), so absolute cross-round comparisons need a throttle reference.
# The probe is fixed work (zlib + a pure-python loop, CAL_NOMINAL=0.60 s
# on an unthrottled window — the constant below is the single source of
# truth and must NOT be re-pinned from a comment), run
# before, between, and after the timed sections; queries_normalized scales
# each query by (CAL_NOMINAL / median(probe)) — i.e. what the time would be
# on an unthrottled window. CAL_NOMINAL pins the best observed unthrottled
# probe on this host; it must stay FIXED across rounds for comparability.
CAL_NOMINAL = 0.60


def calibrate() -> float:
    import zlib

    buf = bytes(range(256)) * 40000  # ~10 MB, deterministic
    t0 = time.perf_counter()
    for _ in range(8):
        zlib.compress(buf, 6)
    s = 0
    for i in range(3_000_000):
        s += i ^ (i >> 3)
    assert s != 0
    return time.perf_counter() - t0


# The 1-core probe has a blind spot: the host sometimes caps ALL-CORE
# capacity while single-thread speed reads clean (observed 2026-08-17: a
# 32-core flagship ran 2x slow in a window whose 1-core probes read 0.91x
# nominal). An 8-way multiprocessing probe catches that mode. Nominal pinned
# to the best observed on this host; keep FIXED across rounds.
CAL_MP_NOMINAL = 0.14


def _mp_work(_):
    import zlib

    buf = bytes(range(256)) * 20000
    for _ in range(4):
        zlib.compress(buf, 6)
    return 0


def calibrate_mp(procs: int = 8) -> float:
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(_mp_work, range(procs))
    return time.perf_counter() - t0


BENCH_QUERIES = [
    "tpch_q1",
    "colstats_lineitem",
    "presence_orders",
    "topk_categorical",
    "uniques_categorical",
    "histogram_quantity",
    "array_element_stats",
    "duplicate_keys",
    "referential_orphans",
    "token_counts",
    "quality_scores",
    "embedding_topk",
    "sessionization",
    "windowed_counts",
    "minhash_dedup",
    "sketch_stats",
    # round 2 additions (new keys — prior-round comparability preserved)
    "slice_multi",
    "nl_token_stats",
    "simhash_docs",
    # round 3 addition
    "lift_binned",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from data_validation_spark.datagen import ensure_images
    from data_validation_spark.pipeline import default_image_schema, validate_images
    from data_validation_spark.session import get_spark
    from data_validation_spark.stats.options import StatsOptions

    spark = get_spark("dvs-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    # one-time generation (cached parquet); excluded from timed section
    images_path = ensure_images(spark, IMAGES_N, "clean")

    cals = [calibrate()]
    timings: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    cals.append(calibrate())

    # Operator-only timings for the queries whose queries() entries carry
    # in-query ground-truth verification (augmented inputs, subset brute-force
    # comparison): time the bare operator over the RAW documents table so
    # round-over-round numbers track the engine, not the oracle machinery.
    # verify_seconds ≈ full-query time − operator time (the full query also
    # runs the operator, so this is an upper bound on verification overhead).
    from data_validation_spark.dedup.minhash import (
        minhash_lsh_candidates,
        verify_jaccard,
    )
    from data_validation_spark.dedup.simhash import simhash_near_dups

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    op_seconds: dict[str, float] = {}
    t0 = time.time()
    cand = minhash_lsh_candidates(docs, "doc_id", "text", num_hashes=64, bands=16)
    verify_jaccard(cand, docs, "doc_id", "text", threshold=0.5).count()
    op_seconds["minhash_dedup"] = round(time.time() - t0, 3)
    t0 = time.time()
    simhash_near_dups(docs, "doc_id", "text", radius=3).count()
    op_seconds["simhash_docs"] = round(time.time() - t0, 3)
    verify_seconds = {
        k: round(max(timings[k] - v, 0.0), 3) for k, v in op_seconds.items()
    }

    # Pure-numpy baseline JPEG decode throughput (the PIL-less foreign-codec
    # path used by sampled pixel-integrity checks; encode excluded). Single
    # thread — multiply by executor cores for the parallel ceiling.
    import numpy as np

    from data_validation_spark.stats import jpegcodec

    yy, xx = np.mgrid[0:64, 0:64]
    imgs = [
        np.clip(
            np.stack([xx * 4 + i, yy * 4 - i, xx + yy + i], axis=2), 0, 255
        ).astype(np.uint8)
        for i in range(100)
    ]
    encoded = [jpegcodec.encode(im, quality=85) for im in imgs]
    best = float("inf")
    for _ in range(3):  # best-of-3: single-threaded microbench, throttle-prone
        t0 = time.perf_counter()
        for e in encoded:
            assert jpegcodec.decode(e) is not None
        best = min(best, time.perf_counter() - t0)
    jpeg_decode_per_sec = round(len(encoded) / best, 1)

    # flagship: full stats + constraint + row-level pass over the images table
    images = spark.read.parquet(images_path)
    # Warm-up on a 2% sample: codegen compilation of the wide agg, Python
    # worker pool, and shuffle infra are one-time per-JVM costs a steady-state
    # cluster does not pay per job (same methodology as tools/bench_scaling).
    validate_images(
        spark,
        images.sample(fraction=0.02, seed=1),
        default_image_schema(),
        options=StatsOptions(categorical_features={"fmt"}),
        check_pixels=True,
        pixel_sample_rate=0.25,
    )
    # Best-of-2: the first full-table run still pays costs the 2% warm-up
    # cannot reach (page-cache-cold parquet, the full 32-worker Python pool)
    # — observed 17.7 s vs 6.3 s back-to-back on identical code in one
    # window. Steady-state throughput is the second run; both are reported.
    flagship_runs = []
    for _ in range(2):
        t0 = time.time()
        result = validate_images(
            spark,
            images,
            default_image_schema(),
            options=StatsOptions(categorical_features={"fmt"}),
            check_pixels=True,
            pixel_sample_rate=0.25,
        )
        flagship_runs.append(round(time.time() - t0, 3))
    dt = min(flagship_runs)
    timings["images_validate"] = round(dt, 3)
    images_per_sec = IMAGES_N / dt if dt > 0 else 0.0

    cals.append(calibrate())
    # warm the pool-fork path once, then measure multi-core capacity twice
    calibrate_mp()
    mp_cals = [calibrate_mp(), calibrate_mp()]
    # aggregate-capacity sweep: effective parallelism of 32 equal-work procs
    # vs 2 (ideal = 32). Catches capacity-capped host windows where per-core
    # probes read clean but total CPU is limited — see BENCH/BASELINE.md
    # session U. Readings well under 32 mean local[32] numbers that window
    # are not comparable across rounds.
    w2 = min(calibrate_mp(2), calibrate_mp(2))
    w32 = min(calibrate_mp(32), calibrate_mp(32))
    effective_cores_32 = round(32 * w2 / w32, 1)
    cal_med = sorted(cals)[len(cals) // 2]
    # throttle factor: >1 means this window ran slower than the unthrottled
    # reference; normalized times estimate unthrottled-window equivalents
    throttle = cal_med / CAL_NOMINAL
    normalized = {k: round(v / throttle, 3) for k, v in timings.items()}

    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else 0.001)
    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_normalized": normalized,
                "value_normalized": round(sum(normalized.values()), 3),
                "calibration_seconds": [round(c, 3) for c in cals],
                "calibration_nominal": CAL_NOMINAL,
                "throttle_factor": round(throttle, 3),
                "calibration_mp_seconds": [round(c, 3) for c in mp_cals],
                "calibration_mp_nominal": CAL_MP_NOMINAL,
                "throttle_factor_mp": round(min(mp_cals) / CAL_MP_NOMINAL, 3),
                "effective_cores_32": effective_cores_32,
                "op_seconds": op_seconds,
                "verify_seconds": verify_seconds,
                "jpeg_decode_img_per_sec_1core": jpeg_decode_per_sec,
                "images_per_sec_normalized": round(images_per_sec * throttle, 1),
                "sf": sf,
                "images_n": IMAGES_N,
                "images_per_sec": round(images_per_sec, 1),
                "flagship_runs_seconds": flagship_runs,
                "validation_passed": result.passed,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
