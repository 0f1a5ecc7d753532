"""Batch-checkpointed pipeline writes with per-partition lineage + resume.

North-rule requirement: every stage checkpoints per-partition lineage and
metrics so a killed job resumes from the last committed tile batch.

On a production cluster this is Iceberg: one snapshot commit per tile
batch (idempotent `overwriteByFilter(batch_id = N)`), lineage and metrics
in snapshot summary properties, resume = read committed batch ids from the
table's snapshot log. This container has no Iceberg runtime jar, so the
same protocol is implemented over a parquet directory with an atomic
manifest per batch — behaviorally identical for the kill/resume test:

    out/
      batch=<id>/part-*.parquet     (the data, partitioned by batch)
      _manifests/batch-<id>.json    (commit marker: lineage + metrics)

A batch is COMMITTED iff its manifest exists; manifests are written via
tmpfile + atomic rename AFTER the data lands, so a kill at any point
leaves either a committed batch or an invisible partial one. Re-running a
batch first deletes its data dir (idempotent overwrite), so resume is
exactly-once per batch.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BatchCheckpointer:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def committed_batches(self) -> set[int]:
        return {int(f.split("-")[1].split(".")[0])
                for f in os.listdir(self.manifest_dir)
                if f.startswith("batch-") and f.endswith(".json")}

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"batch={batch_id}")

    def write_batch(self, batch_id: int, df: DataFrame,
                    lineage: dict | None = None) -> dict:
        """Idempotent write: overwrite the batch partition, then commit the
        manifest atomically (the Iceberg overwriteByFilter + snapshot-
        commit pattern)."""
        bdir = self._batch_dir(batch_id)
        if os.path.exists(bdir):
            shutil.rmtree(bdir)  # re-run of an uncommitted/failed batch
        t0 = time.time()
        # per-batch metrics: row count + per-numeric-column min/max/mean/std
        # (the reference stamps these on every raster write — dump_raster,
        # utils.py:582-614; Iceberg keeps them as column metrics). Collected
        # via df.observe() DURING the write — one Spark job per batch, no
        # read-back second pass.
        from pyspark.sql import Observation
        num_cols = [f.name for f in df.schema.fields
                    if f.dataType.typeName() in
                    ("double", "float", "long", "integer", "short")]
        metrics = [F.count(F.lit(1)).alias("rows")]
        metrics += [x for c in num_cols for x in (
            F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"),
            F.avg(c).alias(f"avg_{c}"), F.stddev(c).alias(f"std_{c}"),
        )]
        obs = Observation(f"batch-{batch_id}")
        df.observe(obs, *metrics).write.mode("overwrite").parquet(bdir)
        row = obs.get  # available once the write action finished
        n_rows = row["rows"]
        stats: dict[str, dict] = {}
        if num_cols and n_rows:
            stats = {c: {"min": row[f"min_{c}"], "max": row[f"max_{c}"],
                         "mean": row[f"avg_{c}"], "std": row[f"std_{c}"]}
                     for c in num_cols}
        manifest = {
            "batch_id": batch_id,
            "rows": n_rows,
            "column_stats": stats,
            "wall_s": round(time.time() - t0, 3),
            "committed_at": time.time(),
            "lineage": lineage or {},
        }
        tmp = os.path.join(self.manifest_dir, f".batch-{batch_id}.json.tmp")
        final = os.path.join(self.manifest_dir, f"batch-{batch_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # atomic commit point
        return manifest

    def read(self, spark: SparkSession) -> DataFrame:
        """Read only COMMITTED batches (uncommitted partials invisible)."""
        committed = sorted(self.committed_batches())
        paths = [self._batch_dir(b) for b in committed]
        if not paths:
            raise FileNotFoundError("no committed batches")
        return spark.read.parquet(*paths)


def run_batched(spark: SparkSession, batches: dict[int, DataFrame],
                out_dir: str, fail_after: int | None = None) -> set[int]:
    """Run a batch plan, skipping already-committed batches (resume).
    `fail_after` simulates a mid-job kill for the resume test."""
    ck = BatchCheckpointer(out_dir)
    done = ck.committed_batches()
    processed = 0
    for bid in sorted(batches):
        if bid in done:
            continue  # resume: skip committed work
        ck.write_batch(bid, batches[bid], lineage={"stage": "tile_batch"})
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated kill after {processed} batches")
    return ck.committed_batches()
