"""Write-time bucketing eliminates the co-located join/agg shuffle —
asserted on the executed physical plan, not assumed. The equality of the
bucketed and shuffled results is also checked, so the exchange-free plan
is proven to compute the same answer."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from unmixing_spark.io.bucketing import (drop_bucketed, exchange_count,
                                         write_bucketed)


@pytest.fixture()
def bucketed_docs(spark):
    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        write_bucketed(docs, "docs_b", ["doc_id"], 4, f"{tmp}/docs_b")
        write_bucketed(docs.select("doc_id", "lang"), "meta_b",
                       ["doc_id"], 4, f"{tmp}/meta_b")
        yield spark
        drop_bucketed(spark, "docs_b")
        drop_bucketed(spark, "meta_b")


def test_bucketed_join_is_exchange_free(bucketed_docs):
    spark = bucketed_docs
    docs = spark.table("docs_b")
    meta = spark.table("meta_b")
    joined = (docs.join(meta.withColumnRenamed("lang", "lang2"), "doc_id")
              .select("doc_id", "lang", "lang2"))
    assert exchange_count(joined) == 0, "co-bucketed join must not shuffle"
    # same join through the raw (unbucketed) parquet shuffles both sides
    raw = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    shuffled = (raw.join(raw.select("doc_id", F.col("lang").alias("lang2")),
                         "doc_id")
                .select("doc_id", "lang", "lang2"))
    # disable broadcast so the comparison is shuffle-join vs bucketed-join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert exchange_count(shuffled) > 0
        a = sorted(map(tuple, joined.collect()))
        b = sorted(map(tuple, shuffled.collect()))
        assert a == b
        assert all(r[1] == r[2] for r in a)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_is_exchange_free(bucketed_docs):
    spark = bucketed_docs
    agg = (spark.table("docs_b").groupBy("doc_id")
           .agg(F.count("*").alias("c"), F.sum("n_chars").alias("s")))
    assert exchange_count(agg) == 0, "bucket-key agg must not shuffle"
    raw_agg = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
               .groupBy("doc_id")
               .agg(F.count("*").alias("c"), F.sum("n_chars").alias("s")))
    assert exchange_count(raw_agg) > 0
    assert (sorted(map(tuple, agg.collect()))
            == sorted(map(tuple, raw_agg.collect())))
