"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship FCLS tile-unmixing pipeline on
sf0.001. ``queries()``/``oracle_sql()`` pair every SQL-expressible operator
with its DuckDB oracle — both renderings come from the same SQL template
(unmixing_spark/dialect.py), so Spark and DuckDB compute the same logical
function and the driver verifies they agree numerically.

Current registry: 215 queries, 195 with full DuckDB oracles (91%); the 20
rows-only entries are the genuinely non-SQL pipelines (FCLS, MNF, PPI,
SASMA-MESMA + distributed endmember interpolation, LSH/IVF/IVF-PQ ANN,
forward-model/eigen, BPE token counting + BPE-budget packing, the
pyspark.ml quality classifier, and the image/audio/video near-dup
pair queries over decoded media payloads) whose
numerics are verified in tests/ instead (golden fixtures + property
tests + pinned SHA-256 + single-node parity + pure-Python BPE parity).
Coverage map: docs/COVERAGE.md.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from unmixing_spark import dialect as D
from unmixing_spark import pipeline
from unmixing_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → geocode → cell-encode → rasterize to tiles →
    FCLS abundance cubes (SURVEY.md §7.2)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return pipeline.flagship_abundance_tiles(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in registry().items()
            if spec.oracle is not None}
