"""Stream-stream interval join — the streaming twin of q_interval_join.

The batch operator (queries/complete_q.py) decomposes the ts-BETWEEN
theta-join into a constant-expansion bucket equi-join; this module runs
the SAME decomposition as a Structured Streaming stream-stream inner
join, which is exactly why the decomposition matters twice over at
scale: Spark's stream-stream join STATE is keyed by the equi-join key,
so the bucket key both bounds the candidate volume (4 buckets per
window, one per event) and gives the state store a uniform hash key,
while the watermarks + the time-range condition let Spark age state out
instead of keeping every past event forever (the documented
stream-stream join requirement).

Output is the matched (window_id, event) pair stream in append mode —
aggregation happens downstream (a second stateful operator or a batch
rollup over the sink), keeping this operator single-purpose and its
output directly comparable to the batch query's join stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unmixing_spark.queries.complete_q import IJ_BKT_S, IJ_MOD, IJ_WIN_S

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def streaming_interval_join(events: DataFrame,
                            watermark: str = "1 day") -> DataFrame:
    """Join an event stream to the incident-window stream it defines
    (every IJ_MOD-th event opens a [ts, ts+6h) window): bucket-expanded
    stream-stream inner join with watermarks on both sides and the
    residual time-range condition. Emits one row per (window, event)
    match."""
    ep = F.unix_timestamp(F.col("ts").cast("timestamp"))
    ev = (events
          .withColumn("ep", ep)
          .withColumn("e_bkt", (F.col("ep") / IJ_BKT_S).cast("long"))
          .withWatermark("ts", watermark)
          .select("ts", "event_id", "user_id", "ep", "e_bkt",
                  F.floor(F.col("value") * 1000000 + F.lit(0.5))
                  .cast("long").alias("v_micro")))
    n_off = IJ_WIN_S // IJ_BKT_S
    win = (events
           .filter(F.col("event_id") % IJ_MOD == 0)
           .withColumn("w_lo", ep)
           .withColumn("w_hi", ep + IJ_WIN_S)
           .withColumnRenamed("ts", "w_ts")
           .withWatermark("w_ts", watermark)
           .select(F.col("event_id").alias("window_id"), "w_ts",
                   "w_lo", "w_hi",
                   F.explode(F.array(*[F.lit(j) for j in range(n_off + 1)]))
                   .alias("j"))
           .withColumn("w_bkt", (F.col("w_lo") / IJ_BKT_S).cast("long")
                       + F.col("j")))
    cond = ((ev["e_bkt"] == win["w_bkt"])
            & (ev["ep"] >= win["w_lo"]) & (ev["ep"] < win["w_hi"])
            # event-time constraint between the two streams' watermark
            # columns, so the state store can expire both sides. It is a
            # strict SUPERSET (±1 s slack) of the second-truncated epoch
            # predicate above — it only drives state lifetime, never
            # semantics, so the streamed result equals the batch query
            # even for events whose sub-second offset precedes the
            # opener's within the same truncated second.
            & (ev["ts"] >= win["w_ts"] - F.expr("INTERVAL 1 SECOND"))
            & (ev["ts"] <= win["w_ts"]
               + F.expr(f"INTERVAL {IJ_WIN_S + 1} SECOND")))
    return (ev.join(win, cond, "inner")
            .select("window_id", "w_lo", "event_id", "user_id", "v_micro"))
