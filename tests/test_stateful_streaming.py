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


def test_streaming_rate_limit_across_microbatches(spark, tmp_path):
    """Per-host fetch sequence numbers stay dense across micro-batches
    (state carries k_next and the schedule anchor), spacing is exactly
    the per-host crawl delay, and the delay matches the batch twin's
    md5 function."""
    from unmixing_spark.streaming.ratelimit import (host_delay_s,
                                                    streaming_host_rate_limit)

    pipeline.register_tables(spark, SF_SMALL)
    pages = spark.sql(pages_sql(D.SPARK))
    src = str(tmp_path / "src")
    pages.repartition(8).write.parquet(src)   # several files → >1 trigger

    stream = stream_pages(spark, src, PAGES_SCHEMA)
    limited = streaming_host_rate_limit(stream)
    out = str(tmp_path / "out")
    q = (limited.writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(out).toPandas()
    assert len(got) == pages.count()
    for host, g in got.groupby("host"):
        n = len(g)
        assert sorted(g["k"]) == list(range(n)), host   # dense across batches
        delay = host_delay_s(host)
        assert (g["delay_s"] == delay).all()
        anchor = int(g.loc[g["k"] == 0, "sched_epoch"].iloc[0])
        assert (g["sched_epoch"] == anchor + g["k"] * delay).all()
        sched = sorted(g["sched_epoch"])
        assert all(b - a == delay for a, b in zip(sched, sched[1:]))


def test_rate_limit_delay_in_lockstep_with_batch_frontier(spark):
    """The streaming limiter's Python delay function, the batch
    q_crawl_frontier SQL, and the module constants must agree — a drift
    would silently fork the batch and streaming schedules."""
    import pandas as pd

    from unmixing_spark.queries.crawl_q import FRONTIER_DELAY_MODS
    from unmixing_spark.queries import registry
    from unmixing_spark.streaming.ratelimit import DELAY_MODS, host_delay_s

    assert DELAY_MODS == FRONTIER_DELAY_MODS
    out = (registry()["q_crawl_frontier"].spark_fn(spark, SF_SMALL)
           .toPandas()[["host", "delay_s"]].drop_duplicates())
    for r in out.itertuples():
        assert int(r.delay_s) == host_delay_s(r.host), r.host


def test_streaming_cms_merges_across_microbatches(spark, tmp_path):
    """The mergeability property: CMS cells accumulated through grouped
    state over an arbitrary micro-batching of the corpus equal the
    one-shot batch sketch (q_heavy_hitters' cells CTE) cell-for-cell —
    and estimates read from the streamed sketch equal the batch
    operator's published estimates."""
    import duckdb

    from tests.conftest import SF_SMALL as _SF
    from unmixing_spark.queries import registry
    from unmixing_spark.streaming.sketch import streaming_cms_cells

    pipeline.register_tables(spark, _SF)
    pages = spark.sql(pages_sql(D.SPARK))
    src = str(tmp_path / "src")
    pages.repartition(8).write.parquet(src)   # several files → >1 trigger

    stream = stream_pages(spark, src, PAGES_SCHEMA)
    cells = streaming_cms_cells(stream)
    out = str(tmp_path / "out")
    q = (cells.writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(out).toPandas()
    # counts are monotone: the final sketch is the max emission per cell
    final = got.groupby(["i", "b"])["cell"].max()
    assert got.groupby(["i", "b"]).size().max() > 1, \
        "state must have been exercised across more than one micro-batch"

    hh = registry()["q_heavy_hitters"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{_SF}/documents.parquet'")
    # the batch operator's estimate column, re-read through the sketch
    batch = con.sql(hh.oracle).df()
    streamed_cells = {(int(i), int(b)): int(c)
                      for (i, b), c in final.items()}
    import hashlib

    from unmixing_spark.queries.stats_q import CMS_D, CMS_W
    for _, r in batch.iterrows():
        est = min(streamed_cells[
            (i, int(hashlib.md5(f"{i}#{r['tok']}".encode())
                    .hexdigest()[:8], 16) % CMS_W)]
            for i in range(CMS_D))
        assert est == int(r["cms_est"]), r["tok"]
