"""Content-extraction operators (content_q.py) vs independent Python
brute force. The dual renderings share the block/line synthesis, so
dialect parity alone can't catch a wrong rule shared by both — these
pins rebuild the block view and every classification rule a third way."""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.content_q import (
    BADWORDS, BLOCK_LINES, MC_LEN_HIGH, MC_LEN_LOW, MC_LINK_MAX,
    MC_STOP_HI, MC_STOP_LO)
from unmixing_spark.queries.text_q import LEXICON
from tests.test_lines import _lines


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def test_badwords_filter_matches_brute_force(spark):
    out = (registry()["q_badwords_filter"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    dropped = 0
    for _, row in _docs().iterrows():
        toks = re.split(r"\s+", row["text"])
        hits = sum(1 for t in toks if t in BADWORDS)
        r = out.loc[row["doc_id"]]
        assert int(r["n_tok"]) == len(toks)
        assert int(r["bad_hits"]) == hits
        assert round(hits / len(toks), 6) == round(float(r["bad_frac"]), 6)
        assert int(r["keep"]) == (1 if hits == 0 else 0)
        dropped += hits > 0
    # the planted-rare badword must actually drop docs, and the
    # zero-hit list entry ('crash') must not nuke the corpus
    assert 0 < dropped < len(out)


def _blocks(doc_id: int, text: str):
    """Python twin of content_q's block view: (blk, words, stop_hits,
    link_words, btext) per block."""
    stopset = set(LEXICON["en"] + LEXICON["de"])
    lines = _lines(doc_id, text)
    blocks = {}
    for ln, n_words, body, _b, _t, _js, _br, _lo, line in lines:
        blk = ln // BLOCK_LINES
        e = blocks.setdefault(blk, {"words": 0, "stop": 0, "lines": []})
        e["words"] += n_words
        e["stop"] += sum(1 for tok in body.split(" ") if tok in stopset)
        e["lines"].append((ln, line))
    out = []
    for blk in sorted(blocks):
        e = blocks[blk]
        a = int(hashlib.md5(f"{doc_id}:{blk}:lnk".encode())
                .hexdigest()[:8], 16)
        link = min(1 + (a // 3) % 4, e["words"]) if a % 3 == 0 else 0
        btext = " ".join(line for _, line in sorted(e["lines"]))
        out.append((blk, e["words"], e["stop"], link, btext))
    return out


def _classify(words: int, stop: int, link: int) -> str:
    if round(link / words, 6) > MC_LINK_MAX:
        return "bad"
    if words < MC_LEN_LOW:
        return "bad" if stop == 0 else "short"
    if round(stop / words, 6) >= MC_STOP_HI and words >= MC_LEN_HIGH:
        return "good"
    if round(stop / words, 6) >= MC_STOP_LO:
        return "neargood"
    return "bad"


def test_main_content_matches_brute_force(spark):
    out = (registry()["q_main_content"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    seen = {"good": 0, "neargood": 0, "short": 0, "bad": 0}
    promoted_somewhere = empty_somewhere = 0
    for _, row in _docs().iterrows():
        blocks = _blocks(row["doc_id"], row["text"])
        cls = [_classify(w, s, lk) for _, w, s, lk, _ in blocks]
        for c in cls:
            seen[c] += 1
        keep = []
        for i, c in enumerate(cls):
            good = c == "good" or (
                c in ("short", "neargood")
                and (("good" in (cls[i - 1] if i else None,))
                     or ("good" in (cls[i + 1] if i + 1 < len(cls)
                                    else None,))))
            keep.append(good)
        r = out.loc[row["doc_id"]]
        assert int(r["n_blocks"]) == len(blocks)
        assert int(r["bad_blocks"]) == sum(c == "bad" for c in cls)
        assert int(r["good_blocks"]) == sum(keep)
        assert int(r["promoted_blocks"]) == sum(
            1 for k, c in zip(keep, cls) if k and c != "good")
        kept_words = sum(b[1] for b, k in zip(blocks, keep) if k)
        assert int(r["content_words"]) == kept_words
        total = sum(b[1] for b in blocks)
        assert round(kept_words / total, 6) == round(float(r["content_frac"]), 6)
        if sum(keep):
            sha = hashlib.sha256(
                "\n".join(b[4] for b, k in zip(blocks, keep) if k)
                .encode()).hexdigest()
            assert r["content_sha"] == sha
            promoted_somewhere += int(r["promoted_blocks"]) > 0
        else:
            assert pd.isna(r["content_sha"])
            empty_somewhere += 1
    # every classification branch and both edge shapes must actually
    # fire on the corpus, or the pin proves less than it claims
    assert all(v > 0 for v in seen.values()), seen
    assert promoted_somewhere > 0
    assert empty_somewhere > 0


def test_cluster_keep_best_matches_union_find(spark):
    """Keep-best representative vs an independent union-find: same
    components as q_neardup_components, keeper = longest (n_chars DESC,
    doc_id ASC) instead of min doc_id."""
    import duckdb

    from unmixing_spark import dialect as D
    from unmixing_spark.queries.text_q import _minhash_lsh

    out = (registry()["q_cluster_keep_best"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/documents.parquet')")
    pairs = con.execute(
        f"WITH pairs AS ({_minhash_lsh(D.DUCKDB)}) "
        f"SELECT doc_a, doc_b FROM pairs").fetchall()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nchars = dict(zip(_docs()["doc_id"], _docs()["n_chars"]))
    members: dict[int, list[int]] = {}
    for d in out.index:
        members.setdefault(find(d), []).append(d)
    keeper = {c: min(ms, key=lambda d: (-nchars[d], d))
              for c, ms in members.items()}
    for doc_id, row in out.iterrows():
        c = find(doc_id)
        assert int(row["component"]) == c
        assert int(row["comp_size"]) == len(members[c])
        assert int(row["keep"]) == (1 if doc_id == keeper[c] else 0)
    # exactly one keeper per component, and on this corpus the longest-
    # doc rule must pick a different representative than min-doc_id for
    # at least one multi-doc component (else the query adds nothing
    # over q_neardup_components)
    assert int(out["keep"].sum()) == len(members)
    diff = [c for c, ms in members.items()
            if len(ms) > 1 and keeper[c] != min(ms)]
    assert diff
