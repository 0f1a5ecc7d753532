"""Search-index operators (search_q.py) vs independent Python brute force.
Dialect parity alone can't catch a wrong metric shared by both renderings —
these pins recompute BM25 and TF-IDF a third way (plain Python floats over
pandas-loaded parquet) and require the exact ranked output."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.search_q import (
    BM25_B, BM25_K1, BM25_MIN_DF, BM25_QLEN, BM25_QUERIES, BM25_TOPK,
    TFIDF_TOPK,
)


def _docs():
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def _corpus():
    """(tf per (doc, tok), dl per doc, df per tok, n_docs, avgdl) using
    the engine's whitespace-class tokenization (trailing/leading empties
    retained — the \\s+ split semantics both dialects share)."""
    docs = _docs()
    tf: dict[int, Counter] = {}
    for row in docs.itertuples():
        tf[int(row.doc_id)] = Counter(re.split(r"\s+", row.text))
    dl = {d: sum(c.values()) for d, c in tf.items()}
    df: Counter = Counter()
    for c in tf.values():
        df.update(set(c))
    n = len(docs)
    avgdl = sum(dl.values()) / n
    return tf, dl, df, n, avgdl


def test_bm25_topk_vs_brute_force(spark):
    """Exact (qid, rank, doc_id) agreement with a plain-Python BM25 over
    the same deterministic query synthesis, scores to 1e-6."""
    out = registry()["q_bm25_topk"].spark_fn(spark, SF_SMALL).toPandas()
    tf, dl, df, n, avgdl = _corpus()

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    expect_rows = []
    for qid in range(BM25_QUERIES):
        cand = sorted((tok for tok, d in df.items() if d >= BM25_MIN_DF),
                      key=lambda t: md5hex(f"qt{qid}:{t}"))
        terms = cand[:BM25_QLEN]
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        for doc, c in tf.items():
            s = 0.0
            h = 0
            for t in terms:
                if c[t] == 0:
                    continue
                idf = math.log(2 * n + 2) - math.log(2 * df[t] + 1)
                tfn = (c[t] * (BM25_K1 + 1)) / (
                    c[t] + BM25_K1 * (1 - BM25_B + BM25_B * dl[doc] / avgdl))
                s += idf * tfn
                h += 1
            if h:
                scores[doc] = round(s, 6)
                hits[doc] = h
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:BM25_TOPK]
        for r, doc in enumerate(ranked, 1):
            expect_rows.append((qid, r, doc, scores[doc], hits[doc]))

    got = sorted(map(tuple, out[["qid", "rank", "doc_id",
                                 "score", "n_hit_terms"]].itertuples(index=False)))
    expect = sorted(expect_rows)
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:3] == e[:3], (g, e)
        assert abs(g[3] - e[3]) < 1e-6
        assert g[4] == e[4]
    # the ranking is meaningful: every query found a full top-k and at
    # least one multi-term hit (the corpus vocabulary guarantees overlap)
    assert len(out) == BM25_QUERIES * BM25_TOPK
    assert (out.groupby("qid")["n_hit_terms"].max() > 1).all()


def test_tfidf_keywords_vs_brute_force(spark):
    """Exact (doc_id, rank, tok) agreement with plain-Python TF-IDF."""
    out = registry()["q_tfidf_keywords"].spark_fn(spark, SF_SMALL).toPandas()
    tf, _dl, df, n, _avgdl = _corpus()
    expect_rows = []
    for doc, c in tf.items():
        w = {t: round(k * (math.log(n + 1) - math.log(df[t])), 6)
             for t, k in c.items()}
        ranked = sorted(w, key=lambda t: (-w[t], t))[:TFIDF_TOPK]
        for r, t in enumerate(ranked, 1):
            expect_rows.append((doc, r, t, w[t]))
    got = sorted(map(tuple, out[["doc_id", "rank", "tok",
                                 "weight"]].itertuples(index=False)))
    expect = sorted(expect_rows)
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:3] == e[:3], (g, e)
        assert abs(g[3] - e[3]) < 1e-6
    # idf separates: the df-heaviest token never outranks a doc's rarest
    # token when tf ties (spot property, guards a tf-only regression)
    per_doc = out[out["rank"] == 1]
    assert (per_doc["df"] < n).all()
