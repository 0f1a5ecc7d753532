"""q_link_pagerank vs an independent pure-Python fixed-point power
iteration. Dialect parity alone can't catch a recurrence wrong in BOTH
renderings — this pin recomputes the exact integer recurrence a third way
(hashlib md5 edges + Python bigints) and requires bit equality."""

from __future__ import annotations

import hashlib

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.linkgraph_q import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_MAX_FAN,
    PR_ROUNDS,
    PR_SCALE,
)


def _expected():
    doc_ids = sorted(
        pd.read_parquet(f"{SF_SMALL}/documents.parquet")["doc_id"]
        .astype(int).tolist())
    n = len(doc_ids)
    assert doc_ids == list(range(n)), "pin assumes contiguous doc_ids"
    links = []
    for d in doc_ids:
        outdeg = 1 + d % PR_MAX_FAN
        for k in range(outdeg):
            h = int(hashlib.md5(f"{d}#{k}".encode()).hexdigest()[:8], 16)
            links.append((d, outdeg, h % n))
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * n)
    pr = {d: PR_SCALE // n for d in doc_ids}
    prev = pr
    for _ in range(PR_ROUNDS):
        prev = pr
        inc = dict.fromkeys(doc_ids, 0)
        for src, outdeg, dst in links:
            inc[dst] += pr[src] // outdeg
        pr = {d: base + PR_DAMP_NUM * inc[d] // PR_DAMP_DEN
              for d in doc_ids}
    max_delta = max(abs(pr[d] - prev[d]) for d in doc_ids)
    return pr, max_delta, n


def test_pagerank_matches_integer_brute_force(spark):
    out = (registry()["q_link_pagerank"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    pr, max_delta, n = _expected()
    assert len(out) == n
    assert (out["rounds"] == PR_ROUNDS).all()
    assert (out["max_delta"] == max_delta).all()
    got = dict(zip(out["doc_id"].astype(int), out["rank_fp"].astype(int)))
    assert got == pr  # bit-exact: the recurrence is pure integer math
    assert (out["out_degree"]
            == 1 + out["doc_id"] % PR_MAX_FAN).all()
    # rank mass is conserved up to deterministic truncation loss: each
    # round leaks < (E + 2N) units (one per exact division: ~2.5N edge
    # contributions + N dampings + N bases) and the stationary deficit is
    # that per-round leak amortized by the geometric series 1/(1-d)
    loss = PR_SCALE - out["rank_fp"].sum()
    per_round = int(out["out_degree"].sum()) + 2 * n
    assert 0 <= loss < per_round * PR_DAMP_DEN // (PR_DAMP_DEN - PR_DAMP_NUM)
    # the graph is non-trivial: ranks genuinely spread
    assert out["rank_fp"].max() > 3 * PR_SCALE // n
    # truncation honesty: the residual is small relative to the spread
    assert max_delta < (out["rank_fp"].max() - out["rank_fp"].min()) // 10
