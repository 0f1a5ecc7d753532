"""Corpus-statistics operators (stats_q.py) vs independent Python brute
force. Dialect parity alone can't catch a metric wrong in BOTH renderings
— these pins compute the expected values a third way."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.stats_q import (
    CDC_MOD,
    CDC_W,
    CMS_D,
    CMS_W,
    HH_TOP,
    LQ_PCTS,
)


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text)


def test_heavy_hitters_match_brute_force(spark):
    out = (registry()["q_heavy_hitters"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("rank").reset_index(drop=True))
    tf = Counter(t for text in _docs()["text"] for t in _toks(text))
    cells: dict[tuple[int, int], int] = {}
    for tok, c in tf.items():
        for i in range(CMS_D):
            b = _md5_32(f"{i}#{tok}") % CMS_W
            cells[(i, b)] = cells.get((i, b), 0) + c
    est = {tok: min(cells[(i, _md5_32(f"{i}#{tok}") % CMS_W)]
                    for i in range(CMS_D)) for tok in tf}
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:HH_TOP]
    expect = [(r + 1, tok, c, est[tok], est[tok] - c)
              for r, (tok, c) in enumerate(top)]
    got = [(int(r["rank"]), r["tok"], int(r["exact_cnt"]),
            int(r["cms_est"]), int(r["overestimate"]))
           for _, r in out.iterrows()]
    assert got == expect
    # the CMS guarantee, checked over the WHOLE vocabulary (not just the
    # reported top): estimate >= true count, always
    assert all(est[tok] >= c for tok, c in tf.items())
    assert (out["ub_ok"] == 1).all()
    # the intentionally tight sketch must actually collide somewhere,
    # otherwise the overestimate audit is vacuous
    assert (out["overestimate"] > 0).any()


def test_length_quantiles_match_brute_force(spark):
    out = (registry()["q_length_quantiles"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("lang").reset_index(drop=True))
    docs = _docs()
    docs["n_toks"] = [len(_toks(t)) for t in docs["text"]]
    rows = []
    for lang, g in docs.groupby("lang"):
        v = g["n_toks"].sort_values().tolist()
        n = len(v)
        row = {"lang": lang, "n_docs": n}
        for p in LQ_PCTS:
            row[f"p{p}_toks"] = v[-(-p * n // 100) - 1]  # ceil(p*n/100)
        row["mean_toks"] = math.floor(sum(v) / n * 1e6 + 0.5) / 1e6
        rows.append(row)
    expect = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    assert list(out["lang"]) == list(expect["lang"])
    for c in expect.columns:
        if c == "mean_toks":
            assert (out[c] - expect[c]).abs().max() < 1e-9
        elif c != "lang":
            assert list(out[c].astype(int)) == list(expect[c].astype(int)), c
    # quantiles are monotone per language
    for _, r in out.iterrows():
        seq = [r[f"p{p}_toks"] for p in LQ_PCTS]
        assert seq == sorted(seq)


def _cdc_chunk_texts(toks: list[str]) -> list[list[str]]:
    """Independent re-chunking: position p (1-based) cuts AFTER itself iff
    p >= CDC_W and md5 of the CDC_W-token window ending at p is 0 mod
    CDC_MOD."""
    chunks, cur = [], []
    for p, tok in enumerate(toks, start=1):
        cur.append(tok)
        if p >= CDC_W:
            gram = " ".join(toks[p - CDC_W:p])
            if _md5_32(gram) % CDC_MOD == 0:
                chunks.append(cur)
                cur = []
    if cur:
        chunks.append(cur)
    return chunks


def test_cdc_chunks_match_brute_force(spark):
    out = (registry()["q_cdc_chunks"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    docs = _docs()
    per_doc: dict[int, list[list[str]]] = {
        int(r["doc_id"]): _cdc_chunk_texts(_toks(r["text"]))
        for _, r in docs.iterrows()}
    copies: Counter[str] = Counter()
    doc_of: dict[str, set[int]] = {}
    for doc_id, chunks in per_doc.items():
        for ch in chunks:
            key = " ".join(ch)
            copies[key] += 1
            doc_of.setdefault(key, set()).add(doc_id)
    expect = {}
    for doc_id, chunks in per_doc.items():
        keys = [" ".join(ch) for ch in chunks]
        expect[doc_id] = (
            len(chunks),
            sum(len(ch) for ch in chunks),
            sum(1 for k in keys if copies[k] >= 2),
            sum(len(ch) for ch, k in zip(chunks, keys) if copies[k] >= 2),
            sum(len(ch) for ch, k in zip(chunks, keys)
                if len(doc_of[k]) >= 2),
        )
    got = {int(r["doc_id"]): (int(r["n_chunks"]), int(r["n_toks"]),
                              int(r["dup_chunks"]), int(r["dup_toks"]),
                              int(r["crossdoc_dup_toks"]))
           for _, r in out.iterrows()}
    assert got == expect
    # the dedup branches are exercised: duplicated chunks exist, both
    # within and across documents, and non-duplicated chunks exist too
    assert out["dup_chunks"].sum() > 0
    assert out["crossdoc_dup_toks"].sum() > 0
    assert (out["dup_chunks"] < out["n_chunks"]).any()
    # chunking is a partition: token counts reconcile with the corpus
    assert int(out["n_toks"].sum()) == sum(
        len(_toks(t)) for t in docs["text"])


def test_cdc_boundaries_are_content_local():
    """The CDC property: prepending a token shifts every position, yet
    all boundaries strictly after the first CDC_W-window re-align —
    chunk sets differ only near the edit (fixed-size blocking would
    re-chunk EVERYTHING). This is the reason the operator exists."""
    toks = _toks(_docs()["text"].iloc[0])
    base = [" ".join(c) for c in _cdc_chunk_texts(toks)]
    edited = [" ".join(c) for c in _cdc_chunk_texts(["zzz", *toks])]
    assert base != edited
    shared = set(base) & set(edited)
    # every chunk after the first boundary survives the edit
    assert shared.issuperset(base[1:])


def test_hll_distinct_matches_brute_force(spark):
    from unmixing_spark.queries.stats_q import HLL_ALPHA, HLL_M, HLL_RMAX

    out = (registry()["q_hll_distinct"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values(["scope", "lang"])
           .reset_index(drop=True))
    docs = _docs()
    items: dict[tuple[str, str], set[str]] = {}
    streams: dict[tuple[str, str], list[str]] = {}
    for _, r in docs.iterrows():
        toks = _toks(r["text"])
        streams.setdefault(("tokens", r["lang"]), []).extend(toks)
        streams.setdefault(("bigrams", r["lang"]), []).extend(
            f"{a} {b}" for a, b in zip(toks, toks[1:]))
    for key, stream in streams.items():
        items[key] = set(stream)

    def hll(stream):
        reg = [0] * HLL_M
        for it in stream:
            h = _md5_32(it)
            idx, rest = h % HLL_M, h // HLL_M
            rho = HLL_RMAX if rest == 0 else (rest & -rest).bit_length()
            reg[idx] = max(reg[idx], rho)
        s = sum(1.0 / (1 << m) for m in reg)
        v = sum(1 for m in reg if m == 0)
        raw = HLL_ALPHA * HLL_M * HLL_M / s
        if raw <= 2.5 * HLL_M and v > 0:
            return math.log(HLL_M) * HLL_M - math.log(v) * HLL_M, 1
        return raw, 0

    assert len(out) == len(items)
    for _, r in out.iterrows():
        key = (r["scope"], r["lang"])
        est, lin = hll(streams[key])
        assert int(r["exact_nd"]) == len(items[key])
        assert int(r["linear_branch"]) == lin
        assert abs(float(r["est_nd"])
                   - math.floor(est * 1e6 + 0.5) / 1e6) < 1e-6
    # both estimator branches fire, and the raw branch is in the
    # theoretical error regime (sigma ~ 1.04/sqrt(m) = 26%; allow 3 sigma)
    assert set(out["linear_branch"]) == {0, 1}
    raw_rows = out[out["linear_branch"] == 0]
    rel = ((raw_rows["est_nd"] - raw_rows["exact_nd"]).abs()
           / raw_rows["exact_nd"])
    assert (rel < 0.8).all()


def test_minhash_est_audit_matches_brute_force(spark):
    from unmixing_spark.queries.text_q import (
        _MH_A,
        _MH_B,
        _MH_P,
        BANDS,
        HOT_BUCKET_CAP,
        N_HASHES,
        SHINGLE,
    )

    out = (registry()["q_minhash_est_audit"].spark_fn(spark, SF_SMALL)
           .toPandas())
    docs = _docs()
    shset: dict[int, set[str]] = {}
    sig: dict[int, list[int]] = {}
    for _, r in docs.iterrows():
        text, did = r["text"], int(r["doc_id"])
        n = max(len(text) - SHINGLE + 1, 1)
        shingles = [text[i:i + SHINGLE] for i in range(n)]
        shset[did] = set(shingles)
        mins = [_MH_P] * N_HASHES
        for sh in shingles:
            x = _md5_32(sh) % _MH_P
            for j in range(N_HASHES):
                mins[j] = min(mins[j], (_MH_A[j] * x + _MH_B[j]) % _MH_P)
        sig[did] = mins
    # LSH bucket membership + hot-bucket cap, replicated exactly
    member: list[tuple[int, str]] = []
    per_band = N_HASHES // BANDS
    for did, mins in sig.items():
        for b in range(BANDS):
            cols = "_".join(str(mins[b * per_band + j])
                            for j in range(per_band))
            member.append((did, hashlib.md5(cols.encode()).hexdigest()))
    bsz = Counter(bh for _, bh in member)
    by_bh: dict[str, list[int]] = {}
    for did, bh in member:
        if bsz[bh] <= HOT_BUCKET_CAP:
            by_bh.setdefault(bh, []).append(did)
    pairs = {(a, b) for ds in by_bh.values()
             for a in ds for b in ds if a < b}
    expect = {}
    for a, b in pairs:
        matched = sum(1 for j in range(N_HASHES) if sig[a][j] == sig[b][j])
        i = len(shset[a] & shset[b])
        u = len(shset[a]) + len(shset[b]) - i
        # exact HALF_UP micro-unit rounding of the rationals, matching
        # the query's integer fixed-point arithmetic
        expect[(a, b)] = (matched,
                          matched * (1_000_000 // N_HASHES) / 1e6,
                          ((2_000_000 * i + u) // (2 * u)) / 1e6)
    got = {(int(r["doc_a"]), int(r["doc_b"])):
           (int(r["matched_hashes"]), float(r["est_jaccard"]),
            float(r["exact_jaccard"]))
           for _, r in out.iterrows()}
    assert set(got) == set(expect)
    for k, (m, e, x) in expect.items():
        gm, ge, gx = got[k]
        assert gm == m and abs(ge - e) < 1e-9 and abs(gx - x) < 1e-9
    # the audit is informative: both near-exact estimates and real
    # estimator error are present
    assert (out["abs_err"] < 0.05).any()
    assert (out["abs_err"] > 0.1).any()


def test_time_split_matches_brute_force(spark):
    from unmixing_spark.queries.hygiene_q import SPAN_K, SPLIT_CUTOFF

    out = (registry()["q_time_split"].spark_fn(spark, SF_SMALL)
           .toPandas())
    docs = _docs()
    split_of, grams_of = {}, {}
    for _, r in docs.iterrows():
        url = f"https://{r['source']}.example.com/{r['lang']}/{r['doc_id']}"
        ts = 1735689600 + _md5_32(url) % 31536000
        split_of[url] = "train" if ts < SPLIT_CUTOFF else "eval"
        toks = _toks(r["text"])
        grams_of[url] = {" ".join(toks[i:i + SPAN_K])
                         for i in range(len(toks) - SPAN_K + 1)}
    sides: dict[str, set[str]] = {"train": set(), "eval": set()}
    for url, gs in grams_of.items():
        sides[split_of[url]] |= gs
    cross = sides["train"] & sides["eval"]
    expect = {url: (split_of[url], len(grams_of[url] & cross))
              for url in split_of}
    got = {r["url"]: (r["split"], int(r["n_leak_grams"]))
           for _, r in out.iterrows()}
    assert got == expect
    assert ((out["leaked"] == 1) == (out["n_leak_grams"] > 0)).all()
    # every branch fires: leaks exist on both sides, clean docs exist,
    # and both splits are populated
    for s in ("train", "eval"):
        g = out[out["split"] == s]
        assert len(g) and g["leaked"].any() and (g["leaked"] == 0).any()


def test_weighted_sample_matches_brute_force(spark):
    from unmixing_spark.queries.stats_q import WS_TAKE

    out = (registry()["q_weighted_sample"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("rank").reset_index(drop=True))
    docs = _docs()
    keyed = []
    for _, r in docs.iterrows():
        h = _md5_32(str(r["doc_id"]))
        k = (math.log(h + 1) - math.log(4294967296)) / r["n_chars"]
        keyed.append((k, int(r["doc_id"]), int(r["n_chars"])))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    expect = keyed[:WS_TAKE]
    assert len(out) == WS_TAKE
    assert list(out["rank"]) == list(range(1, WS_TAKE + 1))
    got = list(zip(out["doc_id"].astype(int), out["weight"].astype(int)))
    assert got == [(d, w) for _, d, w in expect]
    for g, (k, _, _) in zip(out["log_key"], expect):
        assert abs(g - k) < 1e-6
    # the selection boundary is not a float-precision coin toss: the gap
    # between the last key in and the first key out is far above ulp
    assert expect[WS_TAKE - 1][0] - keyed[WS_TAKE][0] > 1e-9
    # PPS semantics: the weight-proportional draw prefers heavier docs
    assert out["weight"].mean() > docs["n_chars"].mean()


def test_quantile_sketch_audit_matches_brute_force(spark):
    """q_quantile_sketch_audit vs a pure-Python DDSketch(gamma=2): the
    bucket pick, containment, and 2x bound recomputed independently
    (bit_length binning + cumulative scan, no SQL)."""
    out = (registry()["q_quantile_sketch_audit"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values(["lang", "pct"]).reset_index(drop=True))
    docs = _docs()
    docs["n_toks"] = [len(_toks(t)) for t in docs["text"]]
    rows = []
    for lang, g in docs.groupby("lang"):
        v = sorted(int(x) for x in g["n_toks"])
        n = len(v)
        cells = Counter((x.bit_length() - 1) if x > 0 else -1 for x in v)
        for p in LQ_PCTS:
            target = -(-p * n // 100)  # ceil rank
            cum, k = 0, None
            for kk in sorted(cells):
                cum += cells[kk]
                if cum >= target:
                    k = kk
                    break
            lo = 0 if k == -1 else 1 << k
            hi = 0 if k == -1 else (1 << (k + 1)) - 1
            exact = v[target - 1]
            rows.append({"lang": lang, "pct": p, "n_docs": n,
                         "exact_toks": exact, "sk_lo": lo, "sk_hi": hi,
                         "est_toks": hi})
    expect = (pd.DataFrame(rows).sort_values(["lang", "pct"])
              .reset_index(drop=True))
    assert len(out) == len(expect)
    for c in ["lang", "pct", "n_docs", "exact_toks", "sk_lo", "sk_hi",
              "est_toks"]:
        assert list(out[c]) == list(expect[c]), c
    # the sketch's own guarantees hold on every row
    assert (out["contained"] == 1).all()
    assert (out["bound_ok"] == 1).all()
    assert (out["rel_err"] < 1.0).all()
    assert (out["rel_err"] >= 0.0).all()
    # non-vacuous: the sketch is genuinely approximate somewhere
    assert (out["rel_err"] > 0.0).any()
