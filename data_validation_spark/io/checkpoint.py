"""Per-partition checkpoint ledger: resumable validation runs with lineage +
metrics rows — the north rule's "interrupted jobs resume without recompute".

Layout under ``ledger_dir``:
    _ledger.jsonl             append-only: one line per completed partition
                              (partition, status, lineage, metrics, timing)
    stats_<partition>.json    the partition's statistics artifact
    anomalies_<partition>.json

``run_partitioned`` iterates the partition list, skips partitions already in
the ledger (resume), validates each, and persists artifacts atomically
(tmp-file + rename) so a crash mid-partition never records a partial result.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
from dataclasses import dataclass
from typing import Callable, Optional

from data_validation_spark.pipeline import ValidationRunResult, validate_images
from data_validation_spark.schema import Schema
from data_validation_spark.stats.result import DatasetStatsList

ENGINE_VERSION = "0.1.0"


@dataclass
class PartitionRecord:
    partition: str
    status: str  # "ok" | "failed_validation"
    num_examples: int
    duration_sec: float
    lineage: dict
    metrics: dict


class CheckpointLedger:
    def __init__(self, ledger_dir: str):
        self.dir = ledger_dir
        os.makedirs(ledger_dir, exist_ok=True)
        self.path = os.path.join(ledger_dir, "_ledger.jsonl")

    def completed(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        done[rec["partition"]] = rec
        return done

    def is_done(self, partition: str) -> bool:
        return partition in self.completed()

    def record(self, rec: PartitionRecord) -> None:
        with open(self.path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "partition": rec.partition,
                        "status": rec.status,
                        "num_examples": rec.num_examples,
                        "duration_sec": rec.duration_sec,
                        "lineage": rec.lineage,
                        "metrics": rec.metrics,
                        "engine_version": ENGINE_VERSION,
                        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    }
                )
                + "\n"
            )

    def _atomic_write(self, name: str, text: str) -> None:
        tmp = os.path.join(self.dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, os.path.join(self.dir, name))

    @staticmethod
    def _safe_name(partition: str) -> str:
        # Collision-free: percent-encode everything non-alphanumeric so
        # distinct partitions ('a/b' vs 'a_b', 'x=1' vs 'x-1') cannot map to
        # the same artifact file and silently overwrite each other.
        return urllib.parse.quote(partition, safe="")

    def save_artifacts(self, partition: str, result: ValidationRunResult) -> None:
        safe = self._safe_name(partition)
        self._atomic_write(f"stats_{safe}.json", result.stats.to_json())
        self._atomic_write(f"anomalies_{safe}.json", result.anomalies.to_json())

    def load_stats(self, partition: str) -> Optional[DatasetStatsList]:
        safe = self._safe_name(partition)
        p = os.path.join(self.dir, f"stats_{safe}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return DatasetStatsList.from_json(f.read())


def run_partitioned(
    spark,
    partitions: list[str],
    read_partition: Callable[[str], "object"],
    schema: Schema,
    ledger_dir: str,
    prev_stats_for: Optional[Callable[[str], Optional[DatasetStatsList]]] = None,
    validate_fn: Callable = validate_images,
    extra_lineage: Optional[dict] = None,
    **validate_kwargs,
) -> dict[str, PartitionRecord]:
    """Validate each partition, skipping ones already in the ledger.

    ``read_partition(partition) → DataFrame`` supplies the data (an Iceberg /
    parquet partition-pruned read); per-partition verdicts + artifacts land in
    the ledger directory. Returns records for partitions processed this run.
    """
    ledger = CheckpointLedger(ledger_dir)
    done = ledger.completed()
    out: dict[str, PartitionRecord] = {}
    for part in partitions:
        if part in done:
            continue
        t0 = time.time()
        df = read_partition(part)
        prev = prev_stats_for(part) if prev_stats_for else None
        result = validate_fn(spark, df, schema, prev_stats=prev, **validate_kwargs)
        dt = time.time() - t0
        rec = PartitionRecord(
            partition=part,
            status="ok" if result.passed else "failed_validation",
            num_examples=result.num_examples,
            duration_sec=round(dt, 3),
            lineage={
                "partition": part,
                "engine_version": ENGINE_VERSION,
                "schema_features": [f.name for f in schema.feature],
                **(extra_lineage or {}),
            },
            metrics={
                "anomaly_count": len(result.anomalies.anomalies),
                "violation_counts": {
                    f"{k[0]}::{k[1]}": v for k, v in result.violation_counts.items()
                },
                "examples_per_sec": round(result.num_examples / dt, 1) if dt else None,
            },
        )
        ledger.save_artifacts(part, result)
        ledger.record(rec)
        out[part] = rec
    return out


def run_iceberg_partitioned(
    spark,
    table_path: str,
    schema: Schema,
    ledger_dir: str,
    snapshot_id: Optional[int] = None,
    prev_stats_for: Optional[Callable[[str], Optional[DatasetStatsList]]] = None,
    validate_fn: Callable = validate_images,
    **validate_kwargs,
) -> dict[str, PartitionRecord]:
    """North-rule composition: validate an Iceberg table one partition at a
    time, checkpointing each into the ledger so interrupted runs resume
    without recompute.

    The manifests are planned ONCE (driver-side, KB-scale metadata); file
    lists are grouped by partition and each group reads via one
    ``spark.read.parquet``. The snapshot id is pinned in the ledger's
    lineage rows AND enforced on resume: a resumed run with no explicit
    ``snapshot_id`` adopts the ledger's recorded snapshot, so an append
    between runs cannot cause already-ledgered partitions (whose files
    changed in the new snapshot) to be silently skipped. Pass a different
    explicit ``snapshot_id`` only with a fresh ledger dir.
    """
    from data_validation_spark.io import iceberg_native as _ice

    ledger = CheckpointLedger(ledger_dir)
    completed = ledger.completed()
    # Lineage guard: run_partitioned's resume skip is by partition NAME, so a
    # ledger dir reused across tables would silently skip same-named
    # partitions (e.g. '<unpartitioned>') of a DIFFERENT table without the
    # snapshot-mismatch guard below ever firing. Refuse foreign rows —
    # completed rows recorded for another table, or without Iceberg lineage
    # at all (a plain run_partitioned ledger).
    foreign = sorted(
        {
            str(rec.get("lineage", {}).get("iceberg_table"))
            for rec in completed.values()
            if rec.get("lineage", {}).get("iceberg_table") != table_path
        }
    )
    if foreign:
        raise ValueError(
            f"ledger {ledger_dir} holds completed partitions for "
            f"{foreign} but table {table_path!r} was requested — resuming "
            "would skip same-named partitions of a different table; use a "
            "fresh ledger dir per table"
        )
    recorded = {
        rec["lineage"].get("iceberg_snapshot_id")
        for rec in completed.values()
        if rec.get("lineage", {}).get("iceberg_table") == table_path
    }
    recorded.discard(None)
    tm = _ice.load_table(table_path)  # one metadata read for snapshot+schema
    if snapshot_id is None:
        if len(recorded) == 1:
            snapshot_id = next(iter(recorded))  # resume the run's snapshot
        else:
            snap = tm.current_snapshot()
            snapshot_id = snap["snapshot-id"] if snap else None
    elif recorded and recorded != {snapshot_id}:
        raise ValueError(
            f"ledger {ledger_dir} holds snapshot(s) {sorted(recorded)} but "
            f"snapshot_id={snapshot_id} was requested — use a fresh ledger "
            "dir to validate a different table state"
        )

    entries, deletes = _ice.plan_scan(table_path, snapshot_id=snapshot_id)
    table_schema = tm.schema()
    groups: dict[str, list] = {}
    for e in entries:
        groups.setdefault(_ice.partition_key(e.partition), []).append(e)

    def read_partition(key: str):
        # positional deletes (merge-on-read) apply inside each partition read
        return _ice.read_files(spark, groups[key], deletes, table_schema)

    return run_partitioned(
        spark,
        sorted(groups),
        read_partition,
        schema,
        ledger_dir,
        prev_stats_for=prev_stats_for,
        validate_fn=validate_fn,
        extra_lineage={
            "iceberg_snapshot_id": snapshot_id,
            "iceberg_table": table_path,
        },
        **validate_kwargs,
    )
