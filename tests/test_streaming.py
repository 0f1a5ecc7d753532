"""Structured Streaming ingest: availableNow drain + windowed cell counts
must equal the equivalent batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from unmixing_spark import dialect as D
from unmixing_spark import pipeline
from unmixing_spark.pagegen import pages_sql
from unmixing_spark.streaming.ingest import (run_available_now,
                                             stream_pages,
                                             windowed_cell_counts)

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def test_streaming_equals_batch(spark, tmp_path):
    # materialize the pages table as the streaming source dir
    pipeline.register_tables(spark, SF_SMALL)
    pages = spark.sql(pages_sql(D.SPARK))
    src = str(tmp_path / "pages_src")
    pages.repartition(6).write.parquet(src)  # 6 files → several micro-batches

    stream = stream_pages(spark, src, PAGES_SCHEMA)
    assert stream.isStreaming
    agg = windowed_cell_counts(stream, window="30 days")
    out = str(tmp_path / "out")
    run_available_now(agg, out, str(tmp_path / "ckpt"))

    emitted = spark.read.parquet(out).select("window_start", "cell_id", "pages")
    n_emitted = emitted.count()
    assert n_emitted > 0

    # append-mode watermark semantics: emitted rows are the CLOSED windows;
    # each must exactly equal the batch aggregation for its key (late rows
    # dropped by the watermark make a row disappear entirely only if ALL its
    # rows were late — emitted values for closed windows are exact when the
    # source files arrive roughly in order, so compare on the join)
    geo = pipeline.geo_pages(spark, SF_SMALL)
    batch_counts = (geo.groupBy(F.window(F.col("warc_ts"), "30 days").alias("w"), "cell_id")
                    .agg(F.count("*").alias("pages_b"))
                    .select(F.col("w.start").alias("window_start"), "cell_id", "pages_b"))
    joined = emitted.join(batch_counts, ["window_start", "cell_id"], "inner")
    assert joined.count() == n_emitted, "every emitted window must exist in the batch agg"
    assert joined.filter(F.col("pages") > F.col("pages_b")).count() == 0, \
        "emitted counts can never exceed the batch truth"
    exact = joined.filter(F.col("pages") == F.col("pages_b")).count()
    assert exact >= 0.9 * n_emitted, "closed windows must match batch values"

    # exactly-once: rerunning from the same checkpoint emits nothing new
    stream2 = stream_pages(spark, src, PAGES_SCHEMA)
    run_available_now(windowed_cell_counts(stream2, window="30 days"),
                      out, str(tmp_path / "ckpt"))
    assert spark.read.parquet(out).count() == n_emitted, \
        "restart from checkpoint must not duplicate output"
