"""applyInPandasWithState first-seen dedup: duplicates across micro-batches
must be suppressed by the grouped state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from unmixing_spark import dialect as D
from unmixing_spark import pipeline
from unmixing_spark.pagegen import pages_sql
from unmixing_spark.streaming.ingest import stream_pages
from unmixing_spark.streaming.stateful import streaming_first_seen_dedup

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    pipeline.register_tables(spark, SF_SMALL)
    pages = spark.sql(pages_sql(D.SPARK))
    # duplicate every page (two crawls of the same url) split across files
    dup = pages.unionAll(pages)
    src = str(tmp_path / "src")
    dup.repartition(6).write.parquet(src)   # duplicates land in many files

    stream = stream_pages(spark, src, PAGES_SCHEMA)  # 4 files per trigger
    deduped = streaming_first_seen_dedup(stream)
    out = str(tmp_path / "out")
    q = (deduped.writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(out)
    n_urls = pages.select("url").distinct().count()
    assert got.count() == n_urls, "each url must be emitted exactly once"
    assert got.select("url").distinct().count() == n_urls
