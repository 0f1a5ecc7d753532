"""Kill/resume: a job killed mid-run resumes from the last committed batch
and the final table equals the uninterrupted run (north-rule requirement)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from unmixing_spark import pipeline
from unmixing_spark.io.checkpoint import BatchCheckpointer, run_batched


@pytest.fixture()
def batches(spark):
    cells = pipeline.cell_raster(spark, SF_SMALL)
    # partition the tile space into 4 batches by tile_id ranges
    return {i: cells.filter(F.col("tile_id") % 4 == i) for i in range(4)}


def _collect_sorted(df):
    return df.orderBy("cell_id").toPandas()


def test_kill_and_resume_equals_uninterrupted(spark, batches, tmp_path):
    out_killed = str(tmp_path / "killed")
    out_clean = str(tmp_path / "clean")

    # uninterrupted run
    run_batched(spark, batches, out_clean)

    # killed after 2 batches
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_batched(spark, batches, out_killed, fail_after=2)
    ck = BatchCheckpointer(out_killed)
    assert len(ck.committed_batches()) == 2

    # resume: completes remaining batches only
    done = run_batched(spark, batches, out_killed)
    assert done == {0, 1, 2, 3}

    a = _collect_sorted(ck.read(spark))
    b = _collect_sorted(BatchCheckpointer(out_clean).read(spark))
    assert a.equals(b), "resumed result must equal uninterrupted run"


def test_uncommitted_partial_invisible(spark, batches, tmp_path):
    out = str(tmp_path / "partial")
    ck = BatchCheckpointer(out)
    ck.write_batch(0, batches[0])
    # simulate a crash mid-batch-1: data lands, manifest never written
    batches[1].write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    assert ck.committed_batches() == {0}
    n = ck.read(spark).count()
    assert n == batches[0].count(), "uncommitted partial batch must be invisible"


def test_manifest_lineage_recorded(spark, batches, tmp_path):
    ck = BatchCheckpointer(str(tmp_path / "lin"))
    m = ck.write_batch(0, batches[0], lineage={"stage": "tiles", "sf": "0.001"})
    assert m["rows"] == batches[0].count()
    assert m["lineage"]["stage"] == "tiles"
    # column stats come from df.observe() during the write — spot-check
    assert m["column_stats"]["b1"]["min"] >= 1.0
    assert m["column_stats"]["b2"]["mean"] > 0.0


def test_write_batch_adds_no_jobs_over_bare_write(spark, batches, tmp_path):
    """Stats are observed during the write — write_batch runs exactly as
    many Spark jobs as the bare parquet write of the same DataFrame (AQE
    splits a multi-stage plan into several jobs, so compare, don't pin;
    the old read-back implementation added 2 extra jobs: count + agg)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    sc.setJobGroup("ckpt-bare", "bare write probe")
    try:
        batches[0].write.mode("overwrite").parquet(str(tmp_path / "bare"))
    finally:
        sc.setJobGroup("", "")
    n_bare = len(tracker.getJobIdsForGroup("ckpt-bare"))

    ck = BatchCheckpointer(str(tmp_path / "onejob"))
    sc.setJobGroup("ckpt-observed", "write_batch job count probe")
    try:
        ck.write_batch(0, batches[0])
    finally:
        sc.setJobGroup("", "")
    n_ckpt = len(tracker.getJobIdsForGroup("ckpt-observed"))
    assert n_ckpt == n_bare, f"write_batch ran {n_ckpt} jobs vs bare {n_bare}"
