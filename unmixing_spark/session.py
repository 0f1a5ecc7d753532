"""SparkSession factory tuned for the engine.

Settings rationale (scale notes for the 1000-executor / 100 TB target):

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting —
  web-page coordinates cluster in cities (hot H3/grid cells), so skewed
  groupBy/join inputs are the norm, not the exception.
- Arrow enabled + bounded batch size: every linear-algebra operator
  (FCLS/MNF/PPI/focal) crosses into Python as Arrow batches; the batch size
  bounds Python-side peak memory per task independently of partition size.
- shuffle.partitions: small for local tests (overridable); on a real
  cluster this comes from the submit config (e.g. 2-3x total cores) and AQE
  coalesces down after the fact.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "unmixing-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry points run under the driver harness and under
    ``spark-submit --py-files`` on a real cluster (where ``master`` is None
    and comes from the submit command).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Keep layered SELECTs as separate projections: CollapseProject
        # inlines deterministic expressions into every downstream reference,
        # re-evaluating the md5-geocode tree ~70x per row in the tile
        # pipeline (measured 6x slowdown at 500k pages). Each layer's
        # expressions evaluate once per row; whole-stage codegen still
        # fuses the projections into one pass.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.CollapseProject")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
