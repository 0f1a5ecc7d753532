"""Distributed Lloyd's k-means over the embeddings table — the coarse
quantizer a production IVF similarity index trains before bucketing
(Jegou et al., "Product Quantization for Nearest Neighbor Search", §IV;
the engine's q_ann_ivf_topk consumes exactly such a partition of the
vector space). The reference engine has no vector surface; this is part
of the training-data-pipeline brief.

Bit-parity design (same doctrine as linkgraph_q): the WHOLE iteration is
exact integer arithmetic. Embeddings quantize once as q = round(v * 2^20)
+ 2^21 — the 2^20 multiply is a float exponent shift (IEEE-exact, so the
round() tie cases are deterministic and identical in both engines'
half-away-from-zero semantics) and the 2^21 offset keeps every operand
non-negative so Spark's truncating ``div`` and DuckDB's flooring ``//``
agree (dialect.idiv_i contract). Distances are exact bigint sums of
squared diffs (<= 64 * 2^42 < 2^63); centroid updates are exact integer
means; argmin ties break on centroid id. Spark loop and unrolled DuckDB
oracle therefore agree BIT-FOR-BIT at every round. Rounds are FIXED at
KM_ROUNDS in both renderings; the ``n_changed`` audit column (how many
vectors switched cluster in the final round — an exact integer) makes
the truncation honest: 0 proves Lloyd converged, the standard k-means
stopping criterion.

Scale shape (10^9+ vectors): vectors live in long form (vec_id, dim, q)
— one row per coordinate — so assignment is a broadcast join against the
K*64-row centroid table, a (vec_id, cid)-keyed partial-aggregated sum,
and one vec_id-keyed window argmin; the update is a (cid, dim)-keyed
aggregation whose output is again K*64 rows. Nothing ever shuffles more
than the quantized coordinate stream; centroids stay broadcast-size by
construction. (Production kernels pack the 64 coordinates back into an
array and assign via one vectorized pandas UDF pass — the plumbing swap
is local to the assignment stage; the long form is what keeps the whole
recurrence oracle-checkable. Seeding is first-K here — deterministic;
production uses k-means|| — the per-round recurrence is identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unmixing_spark import dialect as D
from unmixing_spark import pipeline
from unmixing_spark.queries import QuerySpec, register

KM_K = 8           # coarse-quantizer cells (IVF nlist at toy scale)
KM_ROUNDS = 10     # fixed Lloyd depth, both renderings (see module doc)
KM_SCALE = 1 << 20   # quantization step: multiply is an exponent shift
KM_SHIFT = 1 << 21   # offset making every quantized coordinate positive


def _qemb_ctes(d: str) -> str:
    """CTE fragment ending in ``emb``(vec_id, dim, q): the embeddings
    array exploded to long form and quantized to exact positive bigints.
    Spark: LATERAL VIEW posexplode; DuckDB: zipped double-unnest (the
    repo's established pattern, text_q.py)."""
    if d == D.SPARK:
        body = f"""
      SELECT vec_id, pos0 + 1 AS dim,
             cast(round(cast(val as double) * {D.dbl(float(KM_SCALE))})
                  as bigint) + {KM_SHIFT} AS q
      FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos0, val"""
    else:
        body = f"""
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS dim,
             cast(round(cast(unnest(embedding) as double)
                        * {D.dbl(float(KM_SCALE))}) as bigint)
               + {KM_SHIFT} AS q
      FROM embeddings"""
    return f"emb AS {D.mat(d)}({body})"


def _kmeans_oracle() -> str:
    """Unrolled KM_ROUNDS-deep Lloyd iteration as DuckDB SQL: per round
    an assignment CTE (exact integer distances, argmin window with cid
    tie-break) and a centroid-update CTE (exact integer means, empty
    clusters keep their previous centroid via the self-coalescing LEFT
    join)."""
    dd = D.DUCKDB
    mean = D.idiv_i("u.s", "u.cnt", dd)
    ctes = [_qemb_ctes(dd), f"""c0 AS MATERIALIZED (
      SELECT cast(vec_id as bigint) AS cid, dim, q AS c
      FROM emb WHERE vec_id < {KM_K})"""]
    for r in range(1, KM_ROUNDS + 1):
        ctes.append(f"""a{r} AS MATERIALIZED (
      SELECT vec_id, cid, d2 FROM (
        SELECT e.vec_id, c.cid,
               sum((e.q - c.c) * (e.q - c.c)) AS d2,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY sum((e.q - c.c) * (e.q - c.c)), c.cid) AS rn
        FROM emb e JOIN c{r - 1} c ON c.dim = e.dim
        GROUP BY e.vec_id, c.cid) z
      WHERE rn = 1)""")
        ctes.append(f"""c{r} AS MATERIALIZED (
      SELECT p.cid, p.dim, cast(coalesce({mean}, p.c) as bigint) AS c
      FROM c{r - 1} p LEFT JOIN (
        SELECT a.cid, e.dim, sum(e.q) AS s, count(*) AS cnt
        FROM a{r} a JOIN emb e ON e.vec_id = a.vec_id
        GROUP BY a.cid, e.dim) u
        ON u.cid = p.cid AND u.dim = p.dim)""")
    last, prev = KM_ROUNDS, KM_ROUNDS - 1
    ctes.append(f"""moved AS (
      SELECT count(*) AS n_changed
      FROM a{last} x JOIN a{prev} y
        ON y.vec_id = x.vec_id AND y.cid <> x.cid)""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT a.vec_id,
           cast(a.cid as bigint)                          AS cluster,
           cast(a.d2 as bigint)                           AS dist_sq,
           cast(count(*) OVER (PARTITION BY a.cid) as bigint)
                                                          AS cluster_size,
           cast((SELECT n_changed FROM moved) as bigint)  AS n_changed,
           cast({KM_ROUNDS} as bigint)                    AS rounds
    FROM a{last} a
    """


def kmeans_over_embeddings(spark: SparkSession) -> DataFrame:
    """Driver loop twin of the unrolled oracle, reading the registered
    ``embeddings`` view. The quantized long-form coordinate stream is
    localCheckpoint-ed once; the K*64-row centroid table is
    localCheckpoint-ed per round (a tiny eager job that also truncates
    the self-referencing lineage — the standard k-means cadence, cf.
    pyspark.ml's per-iteration action)."""
    emb = spark.sql(
        f"WITH {_qemb_ctes(D.SPARK)} SELECT vec_id, dim, q FROM emb"
    ).localCheckpoint(eager=True)
    cent = (emb.filter(F.col("vec_id") < KM_K)
            .select(F.col("vec_id").cast("bigint").alias("cid"),
                    "dim", F.col("q").alias("c"))
            .localCheckpoint(eager=True))

    assign = prev_assign = None
    for _ in range(KM_ROUNDS):
        prev_assign = assign
        d2 = (emb.join(F.broadcast(cent), "dim")
              .groupBy("vec_id", "cid")
              .agg(F.sum((F.col("q") - F.col("c"))
                         * (F.col("q") - F.col("c"))).alias("d2")))
        rn = F.row_number().over(
            Window.partitionBy("vec_id").orderBy("d2", "cid"))
        assign = (d2.withColumn("rn", rn).filter(F.col("rn") == 1)
                  .select("vec_id", "cid", "d2"))
        upd = (assign.join(emb, "vec_id")
               .groupBy("cid", "dim")
               .agg(F.sum("q").alias("s"), F.count("*").alias("cnt")))
        cent = (cent.alias("p")
                .join(upd.alias("u"), ["cid", "dim"], "left")
                .select("cid", "dim",
                        F.coalesce(F.expr("u.s div u.cnt"), F.col("p.c"))
                        .cast("bigint").alias("c"))
                .localCheckpoint(eager=True))

    moved = (assign.alias("x")
             .join(prev_assign.alias("y"), "vec_id")
             .filter(F.col("x.cid") != F.col("y.cid"))
             .agg(F.count("*").alias("n_changed")))
    size = Window.partitionBy("cid")
    return (assign
            .select("vec_id",
                    F.col("cid").cast("bigint").alias("cluster"),
                    F.col("d2").cast("bigint").alias("dist_sq"),
                    F.count("*").over(size).cast("bigint")
                    .alias("cluster_size"))
            .crossJoin(F.broadcast(
                moved.select(F.col("n_changed").cast("bigint")
                             .alias("n_changed"))))
            .withColumn("rounds", F.lit(KM_ROUNDS).cast("bigint")))


def _kmeans_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipeline.register_tables(spark, sf_dir, ("embeddings",))
    return kmeans_over_embeddings(spark)


register("q_kmeans_quantizer", QuerySpec(
    spark_fn=_kmeans_spark, oracle=_kmeans_oracle(),
    doc="IVF coarse-quantizer training: Lloyd's k-means over exact-"
        "integer quantized embeddings (bit-identical across engines), "
        "fixed depth with an exact moved-count convergence audit column"))
