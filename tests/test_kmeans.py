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
    return assign, sizes, n_changed, vecs


def test_kmeans_matches_integer_brute_force(spark):
    out = (registry()["q_kmeans_quantizer"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("vec_id").reset_index(drop=True))
    assign, sizes, n_changed, _ = _expected()
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


def _rnd6(x: float) -> float:
    """SQL-style half-away-from-zero rounding to 6 places."""
    import math
    return (math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0
            else -math.floor(-x * 1e6 + 0.5) / 1e6)


def test_semdedup_matches_brute_force(spark):
    """q_semdedup vs an independent pure-Python pass: same fitted
    clusters (pinned above), exact-integer dots/norms, IEEE cosine,
    keep = local maximum of centroid distance over the above-threshold
    neighborhood."""
    import math

    from unmixing_spark.queries.kmeans_q import SEM_TAU

    out = (registry()["q_semdedup"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("vec_id").sort_index())
    assign, sizes, _, vecs = _expected()
    clusters: dict[int, list[int]] = {}
    for vid, (cid, _d2) in assign.items():
        clusters.setdefault(cid, []).append(vid)
    cen = {vid: (q.astype(object) - KM_SHIFT) for vid, q in vecs.items()}
    n2 = {vid: int((c * c).sum()) for vid, c in cen.items()}

    exp_keep: dict[int, int] = {}
    exp_n: dict[int, int] = {}
    exp_max: dict[int, float] = {}
    for cid, members in clusters.items():
        for a in members:
            neigh = []
            dominated = 0
            for b in members:
                if b == a:
                    continue
                dp = int((cen[a] * cen[b]).sum())
                cos = _rnd6(float(dp) / (math.sqrt(float(n2[a]))
                                         * math.sqrt(float(n2[b]))))
                if cos >= SEM_TAU:
                    neigh.append(cos)
                    da, db = assign[a][1], assign[b][1]
                    if db > da or (db == da and b < a):
                        dominated = 1
            exp_keep[a] = 0 if dominated else 1
            exp_n[a] = len(neigh)
            exp_max[a] = max(neigh) if neigh else -2.0

    assert set(out.index) == set(assign)
    for vid in assign:
        got = out.loc[vid]
        assert int(got["cluster"]) == assign[vid][0]
        assert int(got["dist_sq"]) == assign[vid][1]
        assert int(got["cluster_size"]) == sizes[assign[vid][0]]
        assert int(got["keep"]) == exp_keep[vid], vid
        assert int(got["n_dup_neighbors"]) == exp_n[vid], vid
        assert abs(got["max_cos"] - exp_max[vid]) < 1e-9, vid
    # non-vacuous: duplicates exist, every duplicate neighborhood keeps
    # at least one member, and the kept majority survives
    dropped = sum(1 for k in exp_keep.values() if k == 0)
    assert dropped > 0
    assert dropped < len(exp_keep) / 2
    for cid, members in clusters.items():
        flagged = [v for v in members if exp_n[v] > 0]
        if flagged:
            assert any(exp_keep[v] for v in flagged), cid


def test_pq_codes_match_integer_brute_force(spark):
    from unmixing_spark.queries.kmeans_q import (
        PQ_K, PQ_M, PQ_ROUNDS, PQ_SUBDIM)

    df = (pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
          .sort_values("vec_id").reset_index(drop=True))
    vecs = {}
    for vid, emb in zip(df["vec_id"].astype(int), df["embedding"]):
        v = np.asarray(emb, dtype=np.float64) * float(KM_SCALE)
        q = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
        vecs[vid] = q.astype(np.int64) + KM_SHIFT

    # per-subspace Lloyd, same integer recurrence, third implementation
    cent = {cid: vecs[cid].copy() for cid in range(PQ_K)}
    assign = prev = None
    for _ in range(PQ_ROUNDS):
        prev = assign
        assign = {}
        for vid, q in vecs.items():
            for m in range(PQ_M):
                s = slice(m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM)
                best = min(((int(((q[s] - c[s]) * (q[s] - c[s])).sum()), cid)
                            for cid, c in cent.items()))
                assign[(vid, m)] = (best[1], best[0])
        sums = {cid: np.zeros(64, dtype=object) for cid in cent}
        cnts = {(cid, m): 0 for cid in cent for m in range(PQ_M)}
        for (vid, m), (cid, _) in assign.items():
            s = slice(m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM)
            sums[cid][s] = sums[cid][s] + vecs[vid][s]
            cnts[(cid, m)] += 1
        for cid in cent:
            new = cent[cid].copy()
            for m in range(PQ_M):
                if cnts[(cid, m)]:
                    s = slice(m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM)
                    new[s] = [int(x) // cnts[(cid, m)] for x in sums[cid][s]]
            cent[cid] = new
    n_changed = sum(1 for k in assign if assign[k][0] != prev[k][0])

    out = (registry()["q_pq_codes"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("vec_id").sort_index())
    assert len(out) == len(vecs)
    for vid in vecs:
        row = out.loc[vid]
        code = 0
        dist = 0
        for m in range(PQ_M):
            cid, d2 = assign[(vid, m)]
            assert int(row[f"c{m}"]) == cid, (vid, m)
            code += cid * (PQ_K ** m)
            dist += d2
        assert int(row["code"]) == code
        assert int(row["distortion"]) == dist
        assert int(row["n_changed"]) == n_changed
        assert int(row["rounds"]) == PQ_ROUNDS
    # the codebooks must be non-trivial: many distinct codes in use and
    # every subspace uses >= 2 codewords
    assert out["code"].nunique() > PQ_K
    for m in range(PQ_M):
        assert out[f"c{m}"].nunique() >= 2


def test_prototypes_match_brute_force(spark):
    """q_prototypes vs ranks/quotas recomputed from the independent
    Python Lloyd assignment (keep = hardest ceil(7n/10) per cluster)."""
    from unmixing_spark.queries.kmeans_q import (
        PRUNE_KEEP_DEN,
        PRUNE_KEEP_NUM,
    )

    out = (registry()["q_prototypes"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("vec_id").reset_index(drop=True))
    assign, sizes, _, _ = _expected()
    members: dict[int, list[tuple[int, int]]] = {}
    for vid, (cid, d2) in assign.items():
        members.setdefault(cid, []).append((d2, vid))
    expect = {}
    for cid, mem in members.items():
        n = len(mem)
        quota = (PRUNE_KEEP_NUM * n + PRUNE_KEEP_DEN - 1) // PRUNE_KEEP_DEN
        hard = sorted(mem, key=lambda t: (-t[0], t[1]))
        proto = sorted(mem)
        proto_rank = {vid: r + 1 for r, (_, vid) in enumerate(proto)}
        for r, (d2, vid) in enumerate(hard):
            expect[vid] = (cid, d2, proto_rank[vid], n,
                           1 if r + 1 <= quota else 0)
    got = {int(r["vec_id"]): (int(r["cluster"]), int(r["dist_sq"]),
                              int(r["proto_rank"]), int(r["cluster_size"]),
                              int(r["keep"]))
           for _, r in out.iterrows()}
    assert got == expect
    # quota exactness + hardest-kept dominance per cluster
    for cid, g in out.groupby("cluster"):
        n = len(g)
        assert int(g["keep"].sum()) == (
            PRUNE_KEEP_NUM * n + PRUNE_KEEP_DEN - 1) // PRUNE_KEEP_DEN
        kept, dropped = g[g["keep"] == 1], g[g["keep"] == 0]
        if len(dropped):
            assert kept["dist_sq"].min() >= dropped["dist_sq"].max()
    assert (out["keep"] == 0).any()   # pruning actually prunes
