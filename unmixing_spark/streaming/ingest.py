"""Incremental crawl ingestion via Structured Streaming.

The reference has no streaming surface (SURVEY.md §2.10) — its time axis
is a list of date-stamped rasters. For incremental crawl ingestion the
engine supplies the standard Spark pattern: file-source readStream over
the pages directory → watermarked tumbling-window aggregation per cell →
foreachBatch sink through the BatchCheckpointer (exactly-once per
micro-batch, same commit protocol as the batch pipeline).

Tested with Trigger.AvailableNow (drain-everything-then-stop), which is
also the production backfill mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unmixing_spark import dialect as D
from unmixing_spark.pagegen import geocode_exprs
from unmixing_spark.spatial.grid import WORLD_GRID, GridSpec


def stream_pages(spark: SparkSession, pages_dir: str, schema: str) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(pages_dir))


def windowed_cell_counts(pages: DataFrame, grid: GridSpec = WORLD_GRID,
                         window: str = "1 day",
                         watermark: str = "2 days") -> DataFrame:
    """Tumbling-window page counts per cell with late-data watermark."""
    g = geocode_exprs(D.SPARK)
    with_cell = (pages
                 .withColumn("lon", F.expr(g["lon"]))
                 .withColumn("lat", F.expr(g["lat"]))
                 .withColumn("cell_id", F.expr(grid.cell_sql("lon", "lat"))))
    return (with_cell
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "cell_id")
            .agg(F.count("*").alias("pages"),
                 F.avg(F.length("text")).alias("mean_text_len"))
            .select(F.col("w.start").alias("window_start"), "cell_id",
                    "pages", "mean_text_len"))


def run_available_now(stream_df: DataFrame, out_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain all available input and stop — backfill/exactly-once mode."""
    q = (stream_df.writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def sessionized_user_activity(events: DataFrame, gap: str = "30 minutes",
                              watermark: str = "2 hours") -> DataFrame:
    """Session-window aggregation per user with a late-data watermark —
    the dynamic-gap counterpart of the tumbling window (F.session_window:
    windows merge while events arrive within ``gap`` of each other, close
    once the watermark passes the gap). Batch twin for the correctness
    check: the lag-based sessionization of queries/core.q_sessionize_events."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("events"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "user_id", "events", "total_value"))


def stream_csv(spark: SparkSession, csv_dir: str, schema,
               max_files_per_trigger: int = 4) -> DataFrame:
    """File-source readStream over an RFC 4180 CSV landing directory,
    using the SAME pinned dialect as the batch boundary
    (io/tabular.py) — the byte-identity guarantee (and its declared
    NUL-next-to-quote limitation) carries over verbatim, because the
    options are applied by the SAME helper, not copied. multiLine=True
    makes each file non-splittable, so streaming parallelism comes from
    the file count per trigger — exactly the shape a crawl landing zone
    produces (many small shards)."""
    from unmixing_spark.io.tabular import apply_csv_read_opts
    return (apply_csv_read_opts(spark.readStream.schema(schema))
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .csv(csv_dir))
