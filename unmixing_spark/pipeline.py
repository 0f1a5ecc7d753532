"""End-to-end pipeline stages (SURVEY.md §3.5 lifecycle).

pages → geo_pages → cell_raster → tiles → abundance. Each stage is a
DataFrame; at cluster scale each materializes to an Iceberg/parquet
checkpoint (io/checkpoint.py) so a killed job resumes from the last
committed tile batch.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from unmixing_spark import dialect as D
from unmixing_spark import pagegen
from unmixing_spark.lsma.mapper import unmix_cells, unmix_tiles
from unmixing_spark.raster.rasterize import assemble_tiles
from unmixing_spark.spatial.grid import WORLD_GRID, GridSpec

# Canonical endmember spectra in band space (b1 pages, b2 text-len, b3
# langs, b4 tokens, b5 url-len, b6 crawl-day) — the "dense hub / average /
# sparse outpost" mixing triangle. Plays the role of the reference's
# (q x p) endmember matrix (lsma.py:182-186).
CANONICAL_ENDMEMBERS = np.array([
    [4.0, 450.0, 3.0, 85.0, 31.0, 350.0],   # dense multilingual hub
    [2.0, 300.0, 1.0, 55.0, 30.0, 180.0],   # average page cluster
    [1.0, 60.0, 1.0, 12.0, 29.0, 10.0],     # sparse outpost
])


# Round-6 scan-parallelism fix (guide §2.5 "input skew: one huge
# unsplittable file ... repartition immediately after the read"): the
# corpus parquet files are single-row-group singletons, so a bare scan
# yields ONE task doing real work and every CPU-heavy map stage
# downstream (tokenize, shingle, quantize, decode) runs serially no
# matter how many cores the session has. When the scan offers fewer
# splits than the session's parallelism target, repartition by the
# table's key right after the read — a one-time shuffle of the (small)
# raw table that the whole query tree then fans out from; the HASH key
# keeps the placement deterministic (guide §2.5's rand() warning) and
# matches the doc_id/vec_id-keyed windows and joins downstream. On a
# real deployment the table is many files and the scan already
# parallelizes — the condition below then never fires.
_REPART_KEYS = {"documents": "doc_id", "embeddings": "vec_id",
                "events": "event_id"}
_scan_parts_cache: dict[tuple[str, str], int] = {}


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: tuple[str, ...] = ("documents",),
                    repartition: bool = True) -> None:
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        key = _REPART_KEYS.get(t)
        if repartition and key is not None:
            cache_key = (sf_dir, t)
            scan_parts = _scan_parts_cache.get(cache_key)
            if scan_parts is None:
                scan_parts = df.rdd.getNumPartitions()
                _scan_parts_cache[cache_key] = scan_parts
            if scan_parts < max(target // 4, 2):
                df = df.repartition(target, key)
        df.createOrReplaceTempView(t)


def geo_pages(spark: SparkSession, sf_dir: str,
              grid: GridSpec = WORLD_GRID) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(pagegen.geo_pages_sql(D.SPARK, grid=grid))


def cell_raster(spark: SparkSession, sf_dir: str,
                grid: GridSpec = WORLD_GRID) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(pagegen.cell_raster_sql(D.SPARK, grid=grid))


def tiles(spark: SparkSession, sf_dir: str,
          grid: GridSpec = WORLD_GRID) -> DataFrame:
    return assemble_tiles(cell_raster(spark, sf_dir, grid),
                          pagegen.BAND_NAMES, grid)


def flagship_abundance_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-rowed FCLS (narrow plan, no shuffle after the cell agg)."""
    return unmix_cells(cell_raster(spark, sf_dir), CANONICAL_ENDMEMBERS,
                       band_cols=list(pagegen.BAND_NAMES))


def flagship_abundance_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-rowed FCLS — the unit the BASELINE throughput metric counts."""
    return unmix_tiles(tiles(spark, sf_dir), CANONICAL_ENDMEMBERS)
