"""q_bitext_margin / q_hard_negatives vs an independent numpy brute
force (the dual-rendered SQL shares its logic between dialects, so
dialect parity alone can't catch a wrong margin or a wrong negative
set — this pins the arithmetic against Artetxe & Schwenk's definition
computed a completely different way)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.mining_q import (
    K_NEG, MARGIN_K, MARGIN_MIN, N_ANCHORS)


def _vectors():
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat, emb["label"].to_numpy()


def test_bitext_margin_matches_brute_force(spark):
    ids, mat, _ = _vectors()
    a_idx = np.where(ids % 2 == 0)[0]
    b_idx = np.where(ids % 2 == 1)[0]
    cos = mat[a_idx] @ mat[b_idx].T          # (|A|, |B|)

    # deterministic top-k along each axis with vec_id tie-break: argsort
    # on (-cos, id) pairs via lexsort
    def topk_mean(c, other_ids, k):
        order = np.lexsort((other_ids, -c))
        return c[order[:k]].mean(), other_ids[order[0]]

    avg_f, best = {}, {}
    for r, ai in enumerate(a_idx):
        m, b0 = topk_mean(cos[r], ids[b_idx], MARGIN_K)
        avg_f[ids[ai]], best[ids[ai]] = m, b0
    avg_r, rbest = {}, {}
    for c, bi in enumerate(b_idx):
        m, a0 = topk_mean(cos[:, c], ids[a_idx], MARGIN_K)
        avg_r[ids[bi]], rbest[ids[bi]] = m, a0

    expected = {}
    bpos = {v: i for i, v in enumerate(ids[b_idx])}
    apos = {v: i for i, v in enumerate(ids[a_idx])}
    for src, dst in best.items():
        c = cos[apos[src], bpos[dst]]
        margin = c / ((avg_f[src] + avg_r[dst]) / 2.0)
        if margin > MARGIN_MIN:
            expected[(src, dst)] = (round(c, 6), round(margin, 6),
                                    1 if rbest[dst] == src else 0)

    out = (registry()["q_bitext_margin"].spark_fn(spark, SF_SMALL)
           .toPandas())
    got = {(int(r.src_id), int(r.dst_id)):
           (r.cos, r.margin, int(r.mutual_best))
           for r in out.itertuples()}
    assert set(got) == set(expected)
    for key, (c, m, mb) in expected.items():
        gc, gm, gmb = got[key]
        assert abs(gc - c) < 1e-6 and abs(gm - m) < 1e-6, key
        assert gmb == mb, key
    # sanity: the mined set is a non-trivial, selective subset
    assert 0 < len(got) < len(a_idx)
    assert any(mb for _, _, mb in got.values())


def test_hard_negatives_matches_brute_force(spark):
    ids, mat, labels = _vectors()
    anchors = np.where(ids < N_ANCHORS)[0]
    expected = {}
    for ai in anchors:
        mask = (labels != labels[ai]) & (ids != ids[ai])
        cand = np.where(mask)[0]
        c = mat[cand] @ mat[ai]
        order = np.lexsort((ids[cand], -c))[:K_NEG]
        for rn, j in enumerate(order, start=1):
            expected[(ids[ai], rn)] = (ids[cand[j]], labels[cand[j]],
                                       round(c[j], 6))

    out = (registry()["q_hard_negatives"].spark_fn(spark, SF_SMALL)
           .toPandas())
    assert len(out) == len(expected)
    for r in out.itertuples():
        nid, nlab, c = expected[(int(r.anchor_id), int(r.rn))]
        assert int(r.neg_id) == nid and int(r.neg_label) == nlab
        assert abs(r.cos - c) < 1e-6
        assert int(r.neg_label) != int(r.anchor_label)
