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


def test_posting_lists_vs_brute_force(spark):
    """Delta-encoded posting strings and their SHA-256 equal a Python
    index build byte-for-byte."""
    out = registry()["q_posting_lists"].spark_fn(spark, SF_SMALL).toPandas()
    tf, _dl, df, _n, _avg = _corpus()
    index: dict[str, list[tuple[int, int]]] = {}
    for doc in sorted(tf):
        for tok, c in tf[doc].items():
            index.setdefault(tok, []).append((doc, c))
    assert len(out) == len(index)
    for r in out.itertuples():
        plist = index[r.tok]
        prev = 0
        parts = []
        for doc, c in plist:
            parts.append(f"{doc - prev}:{c}")
            prev = doc
        postings = " ".join(parts)
        assert r.postings == postings, r.tok
        assert r.postings_sha == hashlib.sha256(postings.encode()).hexdigest()
        assert (int(r.df), int(r.cf), int(r.first_doc)) == (
            len(plist), sum(c for _, c in plist), plist[0][0])


def test_shingle_containment_vs_brute_force(spark):
    """Directed containment pairs equal a Python rebuild of the exact
    rare-gram-blocked spec; both full (C=1) and partial pairs occur."""
    from unmixing_spark.queries.search_q import (CONT_DF_CAP, CONT_MIN,
                                                 CONT_N)

    out = registry()["q_shingle_containment"].spark_fn(spark, SF_SMALL).toPandas()
    docs = _docs()
    sh: dict[int, set] = {}
    for r in docs.itertuples():
        toks = re.split(r"\s+", r.text)
        sh[int(r.doc_id)] = {tuple(toks[i:i + CONT_N])
                             for i in range(len(toks) - CONT_N + 1)}
    dfg: Counter = Counter()
    for s in sh.values():
        dfg.update(s)
    rare = {g for g, c in dfg.items() if 2 <= c <= CONT_DF_CAP}
    by_gram: dict[tuple, list[int]] = {}
    for doc, s in sh.items():
        for g in s & rare:
            by_gram.setdefault(g, []).append(doc)
    cand = set()
    for g, ds in by_gram.items():
        for a in ds:
            for b in ds:
                if a != b:
                    cand.add((a, b))
    expect = {}
    for a, b in cand:
        shared = len(sh[a] & sh[b])
        c = round(shared / len(sh[a]), 6)
        if shared / len(sh[a]) >= CONT_MIN:
            expect[(a, b)] = (shared, len(sh[a]), c)
    got = {(int(r.doc_a), int(r.doc_b)):
           (int(r.n_shared), int(r.n_sh_a), round(float(r.containment), 6))
           for r in out.itertuples()}
    assert got == expect
    cs = [v[2] for v in got.values()]
    assert any(c == 1.0 for c in cs) and any(c < 1.0 for c in cs)


def _bm25_scores():
    """Shared plain-Python BM25 scorer (same formula as the pin above):
    {qid: (terms, {doc: (score6, hits)})}."""
    tf, dl, df, n, avgdl = _corpus()
    out = {}
    for qid in range(BM25_QUERIES):
        cand = sorted((tok for tok, d in df.items() if d >= BM25_MIN_DF),
                      key=lambda t: hashlib.md5(
                          f"qt{qid}:{t}".encode()).hexdigest())
        terms = cand[:BM25_QLEN]
        scores = {}
        for doc, c in tf.items():
            s, h = 0.0, 0
            for t in terms:
                if c[t] == 0:
                    continue
                idf = math.log(2 * n + 2) - math.log(2 * df[t] + 1)
                tfn = (c[t] * (BM25_K1 + 1)) / (
                    c[t] + BM25_K1 * (1 - BM25_B + BM25_B * dl[doc] / avgdl))
                s += idf * tfn
                h += 1
            if h:
                scores[doc] = (round(s, 6), h)
        out[qid] = (terms, scores)
    return out


def test_search_snippets_vs_brute_force(spark):
    """Best-window choice, hit counts, and snippet bytes equal a Python
    rebuild over the BM25 top docs."""
    from unmixing_spark.queries.search_q import SNIP_DOCS, SNIP_W

    out = registry()["q_search_snippets"].spark_fn(spark, SF_SMALL).toPandas()
    docs = _docs().set_index("doc_id")
    expect = {}
    for qid, (terms, scores) in _bm25_scores().items():
        top = sorted(scores, key=lambda d: (-scores[d][0], d))[:SNIP_DOCS]
        for rank, doc in enumerate(top, 1):
            toks = re.split(r"\s+", docs.loc[doc, "text"])
            hitpos = [i + 1 for i, t in enumerate(toks) if t in terms]
            best, best_n = None, -1
            for p in hitpos:
                nh = sum(1 for q in hitpos if p <= q <= p + SNIP_W - 1)
                if nh > best_n:
                    best, best_n = p, nh
            snippet = " ".join(toks[best - 1:best - 1 + SNIP_W])
            expect[(qid, doc)] = (rank, scores[doc][0], best, best_n,
                                  snippet)
    got = {(int(r.qid), int(r.doc_id)):
           (int(r.rank), r.score, int(r.win_start), int(r.n_hits),
            r.snippet) for r in out.itertuples()}
    assert set(got) == set(expect)
    for k, g in got.items():
        e = expect[k]
        assert g[0] == e[0] and abs(g[1] - e[1]) < 1e-6, k
        assert g[2:] == e[2:], k
    for r in out.itertuples():
        assert r.snippet_sha == hashlib.sha256(
            r.snippet.encode()).hexdigest()


def test_query_spellfix_vs_brute_force(spark):
    """Corrections equal a Python rebuild with an independent DP
    levenshtein; every deterministic deletion is recovered unless a
    nearer vocab word legitimately wins."""
    from unmixing_spark.queries.search_q import SPELL_MAX_DIST

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = registry()["q_query_spellfix"].spark_fn(spark, SF_SMALL).toPandas()
    tf, _dl, df, _n, _avg = _corpus()
    missset = {}
    for qid in range(BM25_QUERIES):
        cand = sorted((t for t, d in df.items()
                       if d >= BM25_MIN_DF and len(t) >= 3),
                      key=lambda t: hashlib.md5(
                          f"qt{qid}:{t}".encode()).hexdigest())
        for tok in cand[:BM25_QLEN]:
            p = 1 + int(hashlib.md5(f"sp{tok}".encode())
                        .hexdigest()[:8], 16) % (len(tok) - 1)
            missset[(tok, tok[:p - 1] + tok[p:])] = True
    expect = {}
    for (orig, miss) in missset:
        cands = [(lev(miss, t), -df[t], t) for t in df
                 if abs(len(t) - len(miss)) <= SPELL_MAX_DIST
                 and lev(miss, t) <= SPELL_MAX_DIST]
        d, negdf, fix = min(cands)
        expect[(orig, miss)] = (fix, d, -negdf, int(fix == orig))
    got = {(r.original, r.miss):
           (r.corrected, int(r.dist), int(r.df), int(r.recovered))
           for r in out.itertuples()}
    assert got == expect
    assert any(v[3] == 1 for v in got.values())


def test_autocomplete_vs_brute_force(spark):
    """q_autocomplete vs a Python replay: token frequencies over \\s+
    tokens, every 1..6-char prefix, top-5 by (freq DESC, token ASC)."""
    from unmixing_spark.queries.search_q import AC_MAX_PFX, AC_TOP_K

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    tf = Counter()
    for text in docs["text"]:
        for tok in re.split(r"\s+", text):
            if tok:
                tf[tok] += 1
    pfx: dict[str, list] = {}
    for tok, freq in tf.items():
        for k in range(1, min(len(tok), AC_MAX_PFX) + 1):
            pfx.setdefault(tok[:k], []).append((tok, freq))
    exp = {}
    for p, cands in pfx.items():
        cands.sort(key=lambda tfq: (-tfq[1], tfq[0]))
        for r, (tok, freq) in enumerate(cands[:AC_TOP_K], 1):
            exp[(p, r)] = (tok, freq)

    out = (registry()["q_autocomplete"].spark_fn(spark, SF_SMALL)
           .toPandas())
    got = {(r["prefix"], int(r["rnk"])): (r["completion"], int(r["freq"]))
           for _, r in out.iterrows()}
    assert got == exp
    # structure sanity: every prefix serves <= K rows
    per_prefix = out.groupby("prefix").size()
    assert (per_prefix <= AC_TOP_K).all()


def test_mmr_diversify_vs_brute_force(spark):
    """q_mmr_diversify vs a Python greedy replay using the SAME
    sequential-left-fold dot product (so doubles match bit-for-bit and
    argmax selection is exact, not tolerance-based)."""
    from unmixing_spark.queries.search_q import (
        MMR_K, MMR_LAMBDA, MMR_POOL, MMR_QUERIES,
    )

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for _, r in emb.iterrows()}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    exp = {}
    for q in range(MMR_QUERIES):
        rel = {c: cos(vecs[q], vecs[c]) for c in vecs if c != q}
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_POOL]
        picked = []
        for r in range(1, MMR_K + 1):
            best, best_s = None, None
            for c in pool:
                if c in picked:
                    continue
                if picked:
                    pen = max(cos(vecs[c], vecs[s]) for s in picked)
                    s = MMR_LAMBDA * rel[c] - (1 - MMR_LAMBDA) * pen
                else:
                    s = MMR_LAMBDA * rel[c]
                if best is None or s > best_s or (s == best_s and c < best):
                    best, best_s = c, s
            picked.append(best)
            exp[(q, r)] = (best, round(best_s, 6))

    out = (registry()["q_mmr_diversify"].spark_fn(spark, SF_SMALL)
           .toPandas())
    got = {(int(r["query_id"]), int(r["rnk"])):
           (int(r["hit_id"]), float(r["mmr_score"]))
           for _, r in out.iterrows()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], (k, got[k], exp[k])
        assert abs(got[k][1] - exp[k][1]) < 1e-9
    # diversification actually happened: at least one query's MMR order
    # differs from its pure-relevance order
    changed = 0
    for q in range(MMR_QUERIES):
        rel = {c: cos(vecs[q], vecs[c]) for c in vecs if c != q}
        by_rel = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_K]
        by_mmr = [exp[(q, r)][0] for r in range(1, MMR_K + 1)]
        changed += by_rel != by_mmr
    assert changed >= 1


def test_rrf_hybrid_vs_brute_force(spark):
    """q_rrf_hybrid vs a Python replay: dense cosine ranks (same
    sequential fold), lexical distinct-token-overlap ranks, fused
    1/(K+r) sums with missing-list terms omitted."""
    from unmixing_spark.queries.search_q import (
        RRF_K, RRF_QUERIES, RRF_TOPK,
    )

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for _, r in emb.iterrows()}
    toks = {int(r["doc_id"]): {t for t in re.split(r"\s+", r["text"]) if t}
            for _, r in docs.iterrows()}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    exp = {}
    for q in range(RRF_QUERIES):
        cos = {c: dot(vecs[q], vecs[c])
               / (math.sqrt(dot(vecs[q], vecs[q]))
                  * math.sqrt(dot(vecs[c], vecs[c])))
               for c in vecs if c != q}
        r_dense = {c: r for r, c in enumerate(
            sorted(cos, key=lambda c: (-cos[c], c)), 1)}
        ov = {c: len(toks[q] & toks[c])
              for c in toks if c != q and toks[q] & toks[c]}
        r_lex = {c: r for r, c in enumerate(
            sorted(ov, key=lambda c: (-ov[c], c)), 1)}
        score = {}
        for c in set(r_dense) | set(r_lex):
            s = 0.0
            if c in r_dense:
                s += 1.0 / (RRF_K + r_dense[c])
            if c in r_lex:
                s += 1.0 / (RRF_K + r_lex[c])
            score[c] = s
        top = sorted(score, key=lambda c: (-score[c], c))[:RRF_TOPK]
        for r, c in enumerate(top, 1):
            exp[(q, r)] = (c, round(score[c], 9),
                           r_dense.get(c), r_lex.get(c))

    out = (registry()["q_rrf_hybrid"].spark_fn(spark, SF_SMALL)
           .toPandas())
    got = {(int(r["query_id"]), int(r["rnk"])):
           (int(r["hit_id"]), float(r["rrf_score"]),
            None if pd.isna(r["r_dense"]) else int(r["r_dense"]),
            None if pd.isna(r["r_lex"]) else int(r["r_lex"]))
           for _, r in out.iterrows()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], (k, got[k], exp[k])
        assert abs(got[k][1] - exp[k][1]) < 1e-12
        assert got[k][2] == exp[k][2]
        assert got[k][3] == exp[k][3]


def test_retrieval_eval_vs_brute_force(spark):
    """q_retrieval_eval vs a Python replay: cosine ranking (same fold),
    binary label relevance, nDCG@K with ideal-ladder normalization,
    MRR@K with the no-hit arm."""
    from unmixing_spark.queries.search_q import RE_K, RE_QUERIES

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for _, r in emb.iterrows()}
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    exp = {}
    for q in range(RE_QUERIES):
        cos = {c: dot(vecs[q], vecs[c])
               / (math.sqrt(dot(vecs[q], vecs[q]))
                  * math.sqrt(dot(vecs[c], vecs[c])))
               for c in vecs if c != q}
        order = sorted(cos, key=lambda c: (-cos[c], c))[:RE_K]
        rel = [1 if labels[c] == labels[q] else 0 for c in order]
        n_rel = sum(1 for c in labels if c != q and labels[c] == labels[q])
        dcg = sum(r / math.log2(i + 2) for i, r in enumerate(rel))
        idcg = sum(1.0 / math.log2(i + 2)
                   for i in range(min(n_rel, RE_K)))
        ndcg = dcg / idcg if n_rel else 0.0
        first = next((i + 1 for i, r in enumerate(rel) if r), None)
        mrr = 1.0 / first if first else 0.0
        exp[q] = (n_rel, sum(rel), round(dcg, 9), round(ndcg, 9),
                  round(mrr, 9), first)

    out = (registry()["q_retrieval_eval"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("query_id"))
    assert sorted(out.index) == list(range(RE_QUERIES))
    for q, (n_rel, hits, dcg, ndcg, mrr, first) in exp.items():
        row = out.loc[q]
        assert int(row["n_rel"]) == n_rel
        assert int(row["hits_at_k"]) == hits
        assert abs(float(row["dcg"]) - dcg) < 1e-9
        assert abs(float(row["ndcg"]) - ndcg) < 1e-9
        assert abs(float(row["mrr"]) - mrr) < 1e-9
        got_first = (None if pd.isna(row["first_rel_rank"])
                     else int(row["first_rel_rank"]))
        assert got_first == first
    # non-vacuous: at least one query finds a relevant hit in its top-K
    # (the synthetic embeddings are only weakly label-clustered, so the
    # interesting arms — zero-hit MRR=0 and nonzero nDCG — both occur)
    assert (out["ndcg"] > 0).any()
    assert (out["mrr"] == 0).any()
