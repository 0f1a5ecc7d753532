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
