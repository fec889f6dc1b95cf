"""Scaling-efficiency benchmark: the identical full stats+validation job at
local[N] and local[4N] on the same cached input, reporting images/sec at both
plus efficiency = (thr_4N / thr_N) / 4 — the sandbox proxy for the north
rule's N vs 4N executor clusters (see BASELINE.md protocol).

Each parallelism level runs in its own subprocess (fresh JVM) to avoid
cross-contamination. Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_images] [low_cores] [runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from data_validation_spark.session import get_spark
from data_validation_spark.pipeline import validate_images, default_image_schema
from data_validation_spark.stats.options import StatsOptions

cores = {cores}
spark = get_spark("scal", master=f"local[{{cores}}]", shuffle_partitions=cores)
df = spark.read.parquet({path!r})
n = df.count()  # warm FS cache / JIT scan path
best = None
for _ in range({runs}):
    t0 = time.time()
    r = validate_images(spark, df, default_image_schema(),
                        options=StatsOptions(categorical_features={{"fmt"}}),
                        check_pixels=True, pixel_sample_rate=0.25)
    dt = time.time() - t0
    if best is None or dt < best:
        best = dt
print("RESULT " + json.dumps({{"cores": cores, "sec": best, "n": n,
                               "images_per_sec": n / best,
                               "passed": r.passed}}))
spark.stop()
"""


def run_level(cores: int, path: str, runs: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, path=path, runs=runs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    high = low * 4

    # ensure cached input exists (generated once, excluded from timing)
    sys.path.insert(0, REPO)
    from data_validation_spark.datagen import ensure_images
    from data_validation_spark.session import get_spark

    spark = get_spark("gen", master="local[32]", shuffle_partitions=32)
    path = ensure_images(spark, n_images, "clean")
    spark.stop()

    # Interleave levels across fresh subprocesses and keep the best run per
    # level — the sandbox VM sees intermittent host-level throttling, so
    # back-to-back single measurements are unreliable.
    r_low = r_high = None
    for _ in range(runs):
        a = run_level(low, path, 1)
        b = run_level(high, path, 1)
        if r_low is None or a["sec"] < r_low["sec"]:
            r_low = a
        if r_high is None or b["sec"] < r_high["sec"]:
            r_high = b
    eff = (r_high["images_per_sec"] / r_low["images_per_sec"]) / (high / low)

    report = {
        "n_images": n_images,
        "low": r_low,
        "high": r_high,
        "scaling_efficiency": round(eff, 3),
        "required": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured throughput & scaling efficiency

Full stats + constraint + row-level pass (`pipeline.validate_images`: wide agg
+ exact top-k/uniques + fused image-format histogram + schema validation +
uniqueness + row constraints + 25%-sampled pixel-integrity decode) over the
deterministic `input_hint` images table ({n_images:,} rows, cached parquet).

Sandbox proxy for the N vs 4N executor-cluster requirement: identical job at
`local[{low}]` vs `local[{high}]`, fresh JVM each, best of {runs} runs.

| parallelism | wall time (s) | images/sec |
|---|---|---|
| local[{low}] | {r_low['sec']:.2f} | {r_low['images_per_sec']:.0f} |
| local[{high}] | {r_high['sec']:.2f} | {r_high['images_per_sec']:.0f} |

**Scaling efficiency ({low}→{high} cores) = (thr_{high}/thr_{low})/4 =
{eff:.3f}** (required ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}).

Validation verdict on the clean variant: passed={r_low['passed']}.

Reproduce: `python tools/bench_scaling.py {n_images} {low} {runs}`
(one-time datagen cached under `.data/`). Per-round query timings land in
`BENCH_r{{N}}.json` via `bench.py`.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
