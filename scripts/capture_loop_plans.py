#!/usr/bin/env python
"""Capture the PER-ROUND physical plans of the iterative graph loops
(the returned DataFrame's explain only shows the output tail — the
round bodies execute eagerly inside the query functions).

  python scripts/capture_loop_plans.py TREE_DIR SF_DIR OUT_DIR SUFFIX

Writes hyperball_round_{suffix}.txt, pagerank_round_{suffix}.txt and
hits_halfstep_{suffix}.txt: the plan of one representative round /
half-step, built exactly the way the loop builds it.
"""
from __future__ import annotations

import os
import sys


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    tree, sf_dir, out_dir, suffix = sys.argv[1:5]
    sys.path.insert(0, tree)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from unmixing_spark import dialect as D
    from unmixing_spark import pipeline
    from unmixing_spark.queries import linkgraph_q as L
    from unmixing_spark.session import get_spark

    spark = get_spark(app_name=f"loopplans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    pipeline.register_tables(spark, sf_dir, ("documents",),
                             repartition=False)
    os.makedirs(out_dir, exist_ok=True)

    def write(name, df):
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({suffix}: tree={tree}, sf={sf_dir})\n")
            fh.write(_fmt(df))
        print(f"wrote {path}")

    # HyperBall: one register-propagation round over the wide state
    setup = L._hb_setup(spark)
    if len(setup) == 3:            # round-6 shape: (links, state, k)
        links, state, k = setup
        cap = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        from unmixing_spark import dialect as DD
        state = L._hb_init_acc(state, [f"{DD.dbl(0.0)} AS h", "e AS prev"])
        upd = [f"(h0 + greatest({DD.dbl(0.0)}, e - prev0) / {DD.dbl(1.0)}) AS h",
               "e AS prev"]
        write("hyperball_round",
              L._hb_wide_round(links, state, upd, ["h", "prev"], k, cap))
    else:                          # round-start shape
        links, state = setup
        state = L._hb_init_acc(state, [F.lit(0.0).alias("h"),
                                       F.col("e").alias("prev")])

        def upd(e):
            return [(F.col("h0") + F.greatest(F.lit(0.0), e - F.col("prev0"))
                     / F.lit(1.0)).alias("h"), e.alias("prev")]

        write("hyperball_round",
              L._hb_wide_round(links, state, upd, ["h", "prev"]))

    # HITS: one authority half-step (links join score vector + dst sum)
    hlinks = spark.sql(
        f"WITH {L._link_ctes(D.SPARK)} SELECT src, dst FROM links"
    ).localCheckpoint(eager=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    h = docs.select("doc_id",
                    F.lit(L.HS_SCALE // n).cast("bigint").alias("h"))
    hv = h.withColumnRenamed("doc_id", "src")
    if hasattr(L, "_loop_nparts"):  # round-6 tree broadcasts the vector
        bcast_ok = n * 16 < int(spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", str(10 << 20)))
        if bcast_ok:
            hv = F.broadcast(hv)
    write("hits_halfstep",
          hlinks.join(hv, "src").groupBy("dst").agg(F.sum("h").alias("s")))

    # PageRank: the final-state plan embeds the last PR_CKPT_EVERY
    # rounds of the recurrence (join + contribution sum per round)
    write("pagerank_final", L.pagerank_over_documents(spark, docs=docs))


if __name__ == "__main__":
    main()
