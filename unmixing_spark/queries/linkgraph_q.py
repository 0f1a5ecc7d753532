"""Link-graph centrality for corpus quality weighting (task brief; the
reference engine has no graph surface).

Production crawl pipelines weight and filter sources by link centrality —
Common Crawl publishes harmonic-centrality host rankings, and quality-mix
recipes (CCNet, Gopher) consume such rankings as a source prior. PageRank
(Brin & Page 1998) is the standard power-iteration formulation;
q_link_pagerank computes it at PAGE level over a deterministic synthetic
link graph (pure function of doc_id — the corpus carries no link column),
so the operator shape is exactly what a 10^12-page web graph needs:
one edge-keyed join + one dst-keyed aggregation per round.

Bit-parity design: the whole iteration runs in FIXED-POINT INTEGER
arithmetic — rank mass scaled by PR_SCALE, exact native integer division
(D.idiv_i: Spark ``div`` / DuckDB ``//``), damping applied as a bigint
ratio — so the Spark loop and the unrolled DuckDB oracle agree BIT-FOR-BIT
at every round; no float summation-order effect can accumulate across
rounds. Iteration depth is FIXED at PR_ROUNDS in both renderings
(truncated power iteration, the standard practice): unlike connected
components (scale_q.cc_labels), rank values keep changing below any
tolerance, so an adaptive Spark loop would desynchronize from any
fixed-depth oracle — the in-query ``max_delta`` residual column makes the
truncation honest and auditable instead (residual contracts ~0.85x/round).

Scale shape (10^12 pages): the link table is edge-partitioned and
checkpointed once; each round shuffles contributions keyed by dst (map-side
partial sums) and left-joins back onto the page table keyed by doc_id —
the classic distributed PageRank plan. Rank state is one bigint per page.
On a cluster, pre-bucketing links and ranks by their join keys removes
the per-round re-shuffle of the static edge side entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unmixing_spark import dialect as D
from unmixing_spark import pipeline
from unmixing_spark.queries import QuerySpec, register

PR_SCALE = 10 ** 12   # fixed-point scale: total rank mass in integer units
PR_ROUNDS = 20        # truncated power iteration depth (both renderings):
                      # residual contracts ~0.85x/round; at 20 rounds
                      # max_delta is ~0.3% of the top rank on the synthetic
                      # graph (5.1e7 vs 1.6e10 at sf0.001)
PR_DAMP_NUM = 85      # damping factor 0.85 as an exact integer ratio
PR_DAMP_DEN = 100
PR_MAX_FAN = 4        # out-degree = 1 + doc_id % PR_MAX_FAN in [1, 4]
PR_CKPT_EVERY = 8     # Spark-side lineage truncation cadence (rounds).
                      # Measured warm at sf0.001/sf0.1 (single action):
                      # no truncation ~9-20 s (the residual + output joins
                      # consume the rank chain 3x and Catalyst re-analyzes
                      # a 20-round plan per consumer), every-8 ~6 s;
                      # every-round pays a job per round (CC-style cadence
                      # is only worth it for ADAPTIVE loops)


def _link_ctes(d: str) -> str:
    """CTE fragment ending in ``links``(src, outdeg, dst): each page emits
    1 + doc_id % PR_MAX_FAN out-links whose targets are md5-derived page
    ids in [0, N) — deterministic, dual-rendered, self-loops allowed
    (declared; PageRank stays well-defined). doc_ids are contiguous
    0..N-1 in the corpus, so every dst is a real page and every page has
    out-degree >= 1 (no dangling mass to redistribute)."""
    fan_rows = ", ".join(f"({k})" for k in range(PR_MAX_FAN))
    key = f"{D.to_str('d.doc_id', d)} || '#' || {D.to_str('fan.k', d)}"
    return f"""nd AS (SELECT cast(count(*) as bigint) AS n FROM documents),
    fan AS ({D.values_rel(fan_rows, "t(k)", d)}),
    links AS {D.mat(d)}(
      SELECT d.doc_id AS src,
             cast(1 + d.doc_id % {PR_MAX_FAN} as bigint) AS outdeg,
             ({D.md5_slice(key, 1, d)}) % nd.n AS dst
      FROM documents d
      JOIN fan ON fan.k < 1 + d.doc_id % {PR_MAX_FAN}
      CROSS JOIN nd
    )"""


def _pagerank_oracle() -> str:
    """Unrolled PR_ROUNDS-deep power iteration as DuckDB SQL. Every round
    CTE is MATERIALIZED (each is referenced by the next round plus, for
    the last two, the residual) and uses the identical integer recurrence
    the Spark loop runs: pr' = (1-d)*SCALE/N + d * sum_in(pr/outdeg), all
    divisions exact bigint."""
    dd = D.DUCKDB
    base = D.idiv_i(f"{(PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE}",
                    f"{PR_DAMP_DEN} * nd.n", dd)
    ctes = [_link_ctes(dd), f"""r0 AS MATERIALIZED (
      SELECT doc_id, cast({D.idiv_i(str(PR_SCALE), 'nd.n', dd)} as bigint)
               AS pr
      FROM documents CROSS JOIN nd)"""]
    contrib = D.idiv_i("r.pr", "l.outdeg", dd)
    damped = D.idiv_i(f"{PR_DAMP_NUM} * coalesce(inc.s, 0)",
                      str(PR_DAMP_DEN), dd)
    for r in range(PR_ROUNDS):
        ctes.append(f"""r{r + 1} AS MATERIALIZED (
      SELECT d.doc_id, cast({base} + {damped} as bigint) AS pr
      FROM documents d
      CROSS JOIN nd
      LEFT JOIN (
        SELECT l.dst, sum({contrib}) AS s
        FROM links l JOIN r{r} r ON r.doc_id = l.src
        GROUP BY l.dst) inc ON inc.dst = d.doc_id)""")
    last, prev = f"r{PR_ROUNDS}", f"r{PR_ROUNDS - 1}"
    ctes.append(f"""delta AS (
      SELECT max(abs(a.pr - b.pr)) AS max_delta
      FROM {last} a JOIN {prev} b ON b.doc_id = a.doc_id)""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT d.doc_id,
           cast(1 + d.doc_id % {PR_MAX_FAN} as bigint)    AS out_degree,
           cast(r.pr as bigint)                           AS rank_fp,
           cast((SELECT max_delta FROM delta) as bigint)  AS max_delta,
           cast({PR_ROUNDS} as bigint)                    AS rounds
    FROM documents d JOIN {last} r ON r.doc_id = d.doc_id
    """


def _pagerank_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver loop twin of the unrolled oracle: PR_ROUNDS exact-integer
    power-iteration rounds over DataFrames. The static edge list is
    localCheckpoint-ed once (on a lossy cluster substitute a reliable
    checkpoint — same semantics); rank lineage is truncated every
    PR_CKPT_EVERY rounds so the self-referencing plan stays shallow.
    The N count() is a one-row parquet-footer action (SURVEY §3.4 class)
    feeding the integer base literal."""
    pipeline.register_tables(spark, sf_dir, ("documents",))
    links = spark.sql(
        f"WITH {_link_ctes(D.SPARK)} SELECT src, outdeg, dst FROM links"
    ).localCheckpoint(eager=True)
    docs = spark.table("documents").select("doc_id")
    n = docs.count()
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * n)
    pr = docs.select(
        "doc_id", F.lit(PR_SCALE // n).cast("bigint").alias("pr"))
    prev = pr
    for r in range(PR_ROUNDS):
        prev = pr
        inc = (links.join(pr.withColumnRenamed("doc_id", "src"), "src")
               .select("dst", F.expr("pr div outdeg").alias("c"))
               .groupBy("dst").agg(F.sum("c").alias("s")))
        pr = (docs.join(inc, docs["doc_id"] == inc["dst"], "left")
              .select(docs["doc_id"],
                      (F.lit(base) + F.expr(
                          f"({PR_DAMP_NUM} * coalesce(s, 0L)) "
                          f"div {PR_DAMP_DEN}"))
                      .cast("bigint").alias("pr")))
        if (r + 1) % PR_CKPT_EVERY == 0 and r + 1 < PR_ROUNDS:
            pr = pr.localCheckpoint(eager=True)
    # final ranks feed three consumers (output join, residual, and the
    # residual's broadcast) — materialize once so none re-runs the chain
    pr = pr.localCheckpoint(eager=True)
    delta = (pr.withColumnRenamed("pr", "a")
             .join(prev.withColumnRenamed("pr", "b"), "doc_id")
             .agg(F.max(F.abs(F.col("a") - F.col("b"))).alias("max_delta")))
    return (docs
            .select("doc_id",
                    (F.lit(1) + F.col("doc_id") % PR_MAX_FAN)
                    .cast("bigint").alias("out_degree"))
            .join(pr, "doc_id")
            .crossJoin(F.broadcast(delta))
            .select("doc_id", "out_degree",
                    F.col("pr").cast("bigint").alias("rank_fp"),
                    F.col("max_delta").cast("bigint").alias("max_delta"),
                    F.lit(PR_ROUNDS).cast("bigint").alias("rounds")))


register("q_link_pagerank", QuerySpec(
    spark_fn=_pagerank_spark, oracle=_pagerank_oracle(),
    doc="page-level PageRank over a deterministic synthetic link graph: "
        "fixed-point integer power iteration (bit-identical across "
        "engines), fixed depth with an in-query residual column"))
