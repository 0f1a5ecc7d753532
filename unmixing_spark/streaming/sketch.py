"""Custom stateful streaming operator: count-min-sketch maintenance.

The streaming twin of q_heavy_hitters (queries/stats_q.py): as pages
stream in, the CMS_D x CMS_W cell grid accumulates token counts across
micro-batches through grouped state — the online vocabulary-frequency
monitor a 100 TB ingest keeps WHILE crawling, instead of re-scanning the
corpus per report. Because CMS cells are counters, the sketch is
mergeable by construction: the final streamed state equals the one-shot
batch sketch over the same corpus REGARDLESS of how the stream was
micro-batched — the property the test asserts against q_heavy_hitters'
own cells, and the reason per-shard sketches can sum cell-wise on a
real cluster.

State is ONE bigint per (row, bucket) cell — CMS_D * CMS_W = 64 groups
total, each carrying a running count; each micro-batch does one
cell-keyed exchange of pre-hashed token rows. Emissions are the updated
cell values per batch (monotone, so the latest emission per cell is the
sketch).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from unmixing_spark import dialect as D
from unmixing_spark.queries.stats_q import _cms_bucket

OUT_SCHEMA = "i int, b int, cell bigint"
STATE_SCHEMA = "cell bigint"


def _cms_group(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    i, b = key
    total = state.get[0] if state.exists else 0
    n = sum(len(pdf) for pdf in pdfs)
    total += n
    state.update((int(total),))
    yield pd.DataFrame({"i": [i], "b": [b], "cell": [int(total)]})


def streaming_cms_cells(pages: DataFrame) -> DataFrame:
    """pages stream → per-micro-batch updated CMS cells. Hashing happens
    BEFORE the stateful operator with the exact SQL expressions the
    batch operator uses (dialect-rendered for Spark), so streamed and
    batch sketches agree cell-for-cell by construction."""
    from unmixing_spark.queries.stats_q import CMS_D

    d = D.SPARK
    toks = pages.select(
        F.expr(f"explode({D.ws_split('text', d)})").alias("tok"))
    seeds = ", ".join(str(i) for i in range(CMS_D))
    hashed = toks.select(
        F.expr(f"explode(array({seeds}))").alias("i"), "tok"
    ).select(
        "i",
        F.expr(_cms_bucket("tok", D.to_str("i", d), d)).cast("int").alias("b"),
    )
    return (hashed.groupBy("i", "b")
            .applyInPandasWithState(_cms_group, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
