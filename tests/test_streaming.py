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


def test_session_windows_equal_batch_sessionization(spark, tmp_path):
    """Streaming session windows (F.session_window, 30-min gap) must
    produce the same per-user session COUNT as the batch lag-based
    sessionization (q_sessionize_events semantics) once the stream
    drains."""
    from unmixing_spark.streaming.ingest import sessionized_user_activity

    pipeline.register_tables(spark, SF_SMALL, ("events",))
    # truncate to whole seconds: the batch twin's gap rule runs on
    # unix_timestamp (floored) while session_window is sub-second — a
    # 1799.5s raw gap would merge in streaming but split in the twin
    events = (spark.table("events")
              .withColumn("ts", F.date_trunc("second", "ts"))
              .select("user_id", "ts", "value", "event_id"))
    src = str(tmp_path / "events_src")
    events.repartition(4).write.parquet(src)
    events.createOrReplaceTempView("events_trunc")

    stream = (spark.readStream
              .schema("user_id bigint, ts timestamp, value double, event_id bigint")
              .option("maxFilesPerTrigger", 2).parquet(src))
    agg = sessionized_user_activity(stream, gap="30 minutes")
    out = str(tmp_path / "sess_out")
    run_available_now(agg, out, str(tmp_path / "sess_ckpt"))

    emitted = spark.read.parquet(out)
    n_emitted = emitted.count()
    assert n_emitted > 0

    # batch truth: lag-based sessionization with the SAME boundary rule
    # (session_window starts a new session when the gap is >= the
    # threshold: merge requires ts < prev + gap), one row per session
    batch = spark.sql("""
        WITH marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN unix_timestamp(ts) - lag(unix_timestamp(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800
                       OR lag(unix_timestamp(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM events_trunc),
        sess AS (
          SELECT user_id, ts, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id, min(ts) AS session_start,
               count(*) AS events_b, round(sum(value), 4) AS total_b,
               max(ts) AS last_ts
        FROM sess GROUP BY user_id, sid""").cache()

    # append-mode watermark semantics: only CLOSED sessions are emitted
    # (each user's tail session within the watermark of max ts is withheld
    # in state). Every emitted session must match the batch truth EXACTLY;
    # coverage must include all long-closed sessions.
    joined = emitted.join(batch, ["user_id", "session_start"], "inner")
    assert joined.count() == n_emitted, \
        "every emitted session must exist in the batch sessionization"
    assert joined.filter((F.col("events") != F.col("events_b"))
                         | (F.abs(F.col("total_value") - F.col("total_b"))
                            > 1e-6)).count() == 0, \
        "emitted session aggregates must equal the batch truth"
    max_ts = batch.agg(F.max("last_ts")).collect()[0][0]
    closed = batch.filter(
        F.unix_timestamp(F.lit(max_ts)) - F.unix_timestamp("last_ts")
        > 4 * 3600)
    n_closed = closed.count()
    covered = closed.join(emitted, ["user_id", "session_start"], "semi").count()
    assert covered == n_closed, \
        f"all long-closed sessions must be emitted ({covered}/{n_closed})"


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """streaming/joins.streaming_interval_join drained with availableNow
    must reproduce the batch q_interval_join aggregates exactly — the
    same bucket decomposition, now as a watermarked stream-stream inner
    join (multiple micro-batches, so cross-batch state is exercised)."""
    from unmixing_spark.queries import registry
    from unmixing_spark.streaming.joins import (EVENTS_SCHEMA,
                                                streaming_interval_join)

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "events_src")
    events.repartition(6).write.parquet(src)  # several micro-batches

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 2).parquet(src))
    # the repartitioned source files are NOT time-ordered, so event-time
    # disorder across micro-batches spans the whole 30-day corpus — the
    # watermark must cover it or the join's expired state silently drops
    # matches (exactly the production rule: watermark >= source disorder)
    joined = streaming_interval_join(stream, watermark="40 days")
    assert joined.isStreaming
    out = str(tmp_path / "ij_out")
    q = (joined.writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = (spark.read.parquet(out)
           .groupBy("window_id")
           .agg(F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum("v_micro").alias("sum_value_micro"),
                F.min("w_lo").alias("start_epoch"))
           .toPandas().sort_values("window_id").reset_index(drop=True))
    expect = (registry()["q_interval_join"].spark_fn(spark, SF_SMALL)
              .toPandas().sort_values("window_id").reset_index(drop=True))
    assert len(got) == len(expect) > 0
    for c in ["window_id", "start_epoch", "n_events", "n_users",
              "sum_value_micro"]:
        assert list(got[c].astype(int)) == list(expect[c].astype(int)), c
