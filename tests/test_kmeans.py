"""q_kmeans_quantizer vs an independent pure-Python Lloyd iteration.
Dialect parity alone can't catch a recurrence wrong in BOTH renderings —
this pin recomputes the exact integer recurrence a third way (numpy
quantization + Python bigint means) and requires bit equality."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.kmeans_q import (
    KM_K,
    KM_ROUNDS,
    KM_SCALE,
    KM_SHIFT,
)


def _expected():
    df = (pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
          .sort_values("vec_id").reset_index(drop=True))
    vec_ids = df["vec_id"].astype(int).tolist()
    # identical quantization: float64 multiply by a power of two (exponent
    # shift, exact), then round-half-away like Spark/DuckDB round()
    vecs = {}
    for vid, emb in zip(vec_ids, df["embedding"]):
        v = np.asarray(emb, dtype=np.float64) * float(KM_SCALE)
        q = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
        vecs[vid] = q.astype(np.int64) + KM_SHIFT
    dims = len(next(iter(vecs.values())))

    cent = {cid: vecs[cid].copy() for cid in range(KM_K)}
    assign = prev_assign = None
    for _ in range(KM_ROUNDS):
        prev_assign = assign
        assign = {}
        for vid, q in vecs.items():
            best = min(
                ((int(((q - c) * (q - c)).sum()), cid)
                 for cid, c in cent.items()))
            assign[vid] = (best[1], best[0])   # (cid, d2), tie -> low cid
        sums = {cid: np.zeros(dims, dtype=object) for cid in cent}
        cnts = dict.fromkeys(cent, 0)
        for vid, (cid, _) in assign.items():
            sums[cid] = sums[cid] + vecs[vid]
            cnts[cid] += 1
        for cid in cent:
            if cnts[cid]:
                cent[cid] = np.array(
                    [int(s) // cnts[cid] for s in sums[cid]],
                    dtype=np.int64)
    n_changed = sum(
        1 for vid in vecs if assign[vid][0] != prev_assign[vid][0])
    sizes = dict.fromkeys(range(KM_K), 0)
    for cid, _ in assign.values():
        sizes[cid] += 1
    return assign, sizes, n_changed


def test_kmeans_matches_integer_brute_force(spark):
    out = (registry()["q_kmeans_quantizer"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("vec_id").reset_index(drop=True))
    assign, sizes, n_changed = _expected()
    assert len(out) == len(assign)
    assert (out["rounds"] == KM_ROUNDS).all()
    assert (out["n_changed"] == n_changed).all()
    got = {int(r["vec_id"]): (int(r["cluster"]), int(r["dist_sq"]))
           for _, r in out.iterrows()}
    assert got == assign   # bit-exact: the recurrence is pure integer math
    got_sizes = (out.groupby("cluster")["vec_id"].count().to_dict())
    assert got_sizes == {c: n for c, n in sizes.items() if n}
    assert (out.groupby("cluster")["cluster_size"].first().to_dict()
            == got_sizes)
    # the clustering is non-trivial: >1 cluster survives and Lloyd made
    # progress (some vector moved after round 1... unless it converged)
    assert out["cluster"].nunique() > 1
