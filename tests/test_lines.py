"""Line-level hygiene operators (lines_q.py) vs independent Python brute
force. The dual renderings share the synthesized-line definition, so
dialect parity alone can't catch a wrong rule shared by both — these
pins rebuild the line view and every C4/Gopher rule a third way."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.lines_q import (
    GQ_MAX_BULLET, GQ_MAX_ELLIPSIS, GQ_MAX_MWL, GQ_MAX_SYM, GQ_MAX_WORDS,
    GQ_MIN_ALPHA, GQ_MIN_MWL, GQ_MIN_STOP, GQ_MIN_WORDS, LINE_BASE,
    LINE_SPAN, MIN_LINE_WORDS)
from unmixing_spark.queries.text_q import LEXICON


def _lines(doc_id: int, text: str):
    """Python twin of lines_q._lines_cte: (ln, n_words, body, bullet, t,
    js, brace, lorem, line) per synthesized line."""
    toks = re.split(r"\s+", text)
    lw = LINE_BASE + len(text) % LINE_SPAN
    out = []
    for ln in range(0, (len(toks) + lw - 1) // lw):
        chunk = toks[ln * lw:(ln + 1) * lw]
        body = " ".join(chunk)
        b = int(hashlib.md5(f"{doc_id}:{ln}".encode()).hexdigest()[:8], 16)
        bullet = 1 if b % 7 == 0 else 0
        t = (b // 7) % 10
        js = 1 if (b // 70) % 53 == 0 else 0
        brace = 1 if (b // 3710) % 97 == 0 else 0
        lorem = 1 if (b // 359870) % 89 == 0 else 0
        line = (("- " if bullet else "") + body
                + (" javascript" if js else "")
                + (" lorem ipsum" if lorem else "")
                + (" {" if brace else "")
                + {6: "!", 7: "?", 8: "...", 9: ""}.get(t, "."))
        out.append((ln, len(chunk) + js + 2 * lorem, body,
                    bullet, t, js, brace, lorem, line))
    return out


def _docs():
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def test_c4_line_filters_match_brute_force(spark):
    out = (registry()["q_c4_line_filters"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    branch_hits = {"no_term": 0, "short": 0, "js": 0, "drop": 0}
    for _, row in _docs().iterrows():
        lines = _lines(row["doc_id"], row["text"])
        kept = [(ln, line) for ln, nw, _, _, t, js, _, _, line in lines
                if t != 9 and js == 0 and nw >= MIN_LINE_WORDS]
        has_brace = any(l[6] for l in lines)
        has_lorem = any(l[7] for l in lines)
        keep = 1 if (not has_brace and not has_lorem and kept) else 0
        got = out.loc[row["doc_id"]]
        assert int(got["n_lines"]) == len(lines)
        assert int(got["no_term_lines"]) == sum(1 for l in lines
                                                if l[4] == 9)
        assert int(got["short_lines"]) == sum(1 for l in lines
                                              if l[1] < MIN_LINE_WORDS)
        assert int(got["js_lines"]) == sum(l[5] for l in lines)
        assert int(got["kept_lines"]) == len(kept)
        assert int(got["doc_keep"]) == keep
        assert abs(float(got["kept_frac"])
                   - round(len(kept) / len(lines), 6)) < 1e-9
        if keep:
            cleaned = "\n".join(line for _, line in kept)
            assert got["cleaned_sha"] == hashlib.sha256(
                cleaned.encode()).hexdigest()
            assert int(got["cleaned_chars"]) == len(cleaned)
        else:
            assert got["cleaned_sha"] is None or pd.isna(got["cleaned_sha"])
        branch_hits["no_term"] += int(got["no_term_lines"])
        branch_hits["short"] += int(got["short_lines"])
        branch_hits["js"] += int(got["js_lines"])
        branch_hits["drop"] += 1 - keep
    # the synthesized decorations must exercise every rule branch
    assert all(v > 0 for v in branch_hits.values()), branch_hits


def test_line_dedup_matches_brute_force(spark):
    out = (registry()["q_line_dedup"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    docs = _docs().sort_values("doc_id")
    first: set[str] = set()
    expect: dict[int, tuple[int, int, str | None]] = {}
    for _, row in docs.iterrows():
        lines = _lines(row["doc_id"], row["text"])
        kept_bodies, dup = [], 0
        for ln, _, body, *_ in lines:
            if body in first:
                dup += 1
            else:
                first.add(body)
                kept_bodies.append(body)
        sha = (hashlib.sha256("\n".join(kept_bodies).encode()).hexdigest()
               if kept_bodies else None)
        expect[row["doc_id"]] = (len(lines), dup, sha)
    assert sum(d for _, d, _ in expect.values()) > 0, \
        "corpus must contain duplicated lines (planted exact-copy docs)"
    for doc_id, (n, dup, sha) in expect.items():
        got = out.loc[doc_id]
        assert int(got["n_lines"]) == n
        assert int(got["dup_lines"]) == dup
        assert int(got["kept_lines"]) == n - dup
        if sha is None:
            assert pd.isna(got["kept_sha"])
        else:
            assert got["kept_sha"] == sha


def test_gopher_quality_matches_brute_force(spark):
    out = (registry()["q_gopher_quality"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    stop = set(LEXICON["en"] + LEXICON["de"])
    keeps = drops = 0
    for _, row in _docs().iterrows():
        toks = re.split(r"\s+", row["text"])
        lines = _lines(row["doc_id"], row["text"])
        n_words = len(toks)
        mwl = round(sum(len(t) for t in toks) / n_words, 6)
        stop_hits = sum(1 for t in toks if t in stop)
        alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
        n_lines = len(lines)
        bullets = sum(l[3] for l in lines)
        ell = sum(1 for l in lines if l[4] == 8)
        braces = sum(l[6] for l in lines)
        sym = round((braces + ell) / n_words, 6)
        bull_f = round(bullets / n_lines, 6)
        ell_f = round(ell / n_lines, 6)
        alp_f = round(alpha / n_words, 6)
        rules = [GQ_MIN_WORDS <= n_words <= GQ_MAX_WORDS,
                 GQ_MIN_MWL <= mwl <= GQ_MAX_MWL,
                 sym < GQ_MAX_SYM, bull_f < GQ_MAX_BULLET,
                 ell_f < GQ_MAX_ELLIPSIS, alp_f > GQ_MIN_ALPHA,
                 stop_hits >= GQ_MIN_STOP]
        got = out.loc[row["doc_id"]]
        assert int(got["n_words"]) == n_words
        assert math.isclose(float(got["mean_word_len"]), mwl, abs_tol=1e-9)
        assert math.isclose(float(got["sym_ratio"]), sym, abs_tol=1e-9)
        assert math.isclose(float(got["bullet_frac"]), bull_f, abs_tol=1e-9)
        assert math.isclose(float(got["ellipsis_frac"]), ell_f,
                            abs_tol=1e-9)
        assert math.isclose(float(got["alpha_frac"]), alp_f, abs_tol=1e-9)
        assert int(got["stop_hits"]) == stop_hits
        flags = [int(got[k]) for k in ("r_words", "r_mwl", "r_sym",
                                       "r_bullet", "r_ellipsis", "r_alpha",
                                       "r_stop")]
        assert flags == [int(r) for r in rules]
        assert int(got["keep"]) == int(all(rules))
        keeps += int(all(rules))
        drops += 1 - int(all(rules))
    assert keeps > 0 and drops > 0, (keeps, drops)
