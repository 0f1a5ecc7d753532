"""Line-level corpus hygiene (task brief; the reference has no text
surface): the line/paragraph granularity that sits between the engine's
document-level dedup (q_dedup_exact, q_minhash_*) and substring-level
dedup (q_duplicated_spans).

- q_c4_line_filters — C4's line/document rules (Raffel et al. 2020 §2.2,
  "Exploring the Limits of Transfer Learning" — the C4 cleaning recipe):
  keep lines ending in terminal punctuation with >= 3 words and no
  "javascript"; drop whole documents containing '{' or "lorem ipsum";
  emit the cleaned text's SHA-256 so the oracle checks the surviving
  BYTES, not just the counts.
- q_line_dedup — CCNet-style cross-corpus exact line dedup (Wenzek et
  al. 2020 dedup paragraphs by hash before LM filtering): first
  occurrence (min (doc_id, line_no)) of each line body survives.
- q_gopher_quality — the full Gopher document-quality rule set (Rae et
  al. 2021 §A1.1): word count, mean word length, symbol-to-word ratio,
  bullet/ellipsis line fractions, alphabetic-word fraction, stop-word
  count, and the conjunction keep flag.

The synthetic corpus is single-line (no newlines, no punctuation), so
the line structure is SYNTHESIZED deterministically — the same
convention as linkgraph_q's synthetic edges: lines are fixed-size token
chunks (chunk length a pure function of the TEXT, so byte-identical
documents chunk identically and cross-doc line dedup is actually
exercised by the corpus' planted exact-copy docs), and each line draws
bullet/terminal-punctuation/"javascript"/"{"/"lorem ipsum" decorations
from md5(doc_id, line_no) — planted at rates that exercise every rule
branch. All dual-rendered; every line body is rebuilt by an ORDERED
string aggregation (dialect.ordered_string_agg) so the two engines
construct byte-identical strings.

Scale shape (10^12 docs): the line view is one doc_id-keyed window
exchange (token positions) + one (doc_id, line_no) aggregation — no
cross-doc traffic. q_line_dedup adds the only corpus-wide exchange: a
body-keyed window (at real scale: key by a 128-bit hash of the line,
not the line bytes, to bound shuffle width — the md5 key is already the
join key here). C4/Gopher stats are per-doc aggregations with map-side
combine. No broadcasts needed, no all-pairs anywhere.
"""

from __future__ import annotations

from unmixing_spark import dialect as D
from unmixing_spark.queries import sql_template
from unmixing_spark.queries.text_q import LEXICON, _pos_tokens

LINE_BASE = 4    # tokens per line = LINE_BASE + length(text) % LINE_SPAN
LINE_SPAN = 5    # → L in [4, 8]; a pure function of the text so
                 # byte-identical docs produce byte-identical lines
MIN_LINE_WORDS = 3   # C4 uses >= 3 words per retained line


def _lines_cte(d: str) -> str:
    """CTE chain ending in ``deco``(doc_id, ln, n_words, body, bullet, t,
    js, brace, lorem, line): the synthesized line view.

    ``body`` = L consecutive whitespace tokens rejoined with single
    spaces (ordered agg — byte-identical across engines). ``line`` = the
    decorated body: optional '- ' bullet prefix, optional planted
    "javascript" / "lorem ipsum" / '{' suffixes, and a terminal class
    t in 0..9 drawn from md5(doc_id, ln): t<=5 → '.', 6 → '!', 7 → '?',
    8 → '...', 9 → no terminal punctuation. Planting rates: bullets
    ~14%, unpunctuated ~10%, ellipsis ~10%, "javascript" ~1.9%, '{'
    ~1.0%, "lorem ipsum" ~1.1% of lines — every C4/Gopher rule branch
    fires on the synthetic corpus. ``n_words`` counts the DECORATED
    line's words (body tokens + planted words; the bullet marker is a
    marker, not a word)."""
    seed = f"{D.to_str('doc_id', d)} || ':' || {D.to_str('ln', d)}"
    return f"""pos AS (SELECT doc_id, pos, tok FROM {_pos_tokens(d)}),
    doclen AS (SELECT doc_id,
                      {LINE_BASE} + length(text) % {LINE_SPAN} AS lw
               FROM documents),
    ltok AS (
      SELECT p.doc_id, p.pos, p.tok,
             {D.idiv_i('p.pos - 1', 'dl.lw', d)} AS ln
      FROM pos p JOIN doclen dl ON dl.doc_id = p.doc_id
    ),
    lraw AS (
      SELECT doc_id, ln, count(*) AS body_words,
             {D.ordered_string_agg('tok', 'pos', "' '", d)} AS body
      FROM ltok GROUP BY doc_id, ln
    ),
    lseed AS (
      SELECT doc_id, ln, body_words, body,
             {D.md5_slice(seed, 1, d)} AS b
      FROM lraw
    ),
    lflag AS (
      SELECT doc_id, ln, body_words, body,
             CASE WHEN b % 7 = 0 THEN 1 ELSE 0 END AS bullet,
             {D.idiv_i('b', '7', d)} % 10 AS t,
             CASE WHEN {D.idiv_i('b', '70', d)} % 53 = 0
                  THEN 1 ELSE 0 END AS js,
             CASE WHEN {D.idiv_i('b', '3710', d)} % 97 = 0
                  THEN 1 ELSE 0 END AS brace,
             CASE WHEN {D.idiv_i('b', '359870', d)} % 89 = 0
                  THEN 1 ELSE 0 END AS lorem
      FROM lseed
    ),
    deco AS (
      SELECT doc_id, ln,
             body_words + js + 2 * lorem AS n_words,
             body, bullet, t, js, brace, lorem,
             concat(CASE WHEN bullet = 1 THEN '- ' ELSE '' END,
                    body,
                    CASE WHEN js = 1 THEN ' javascript' ELSE '' END,
                    CASE WHEN lorem = 1 THEN ' lorem ipsum' ELSE '' END,
                    CASE WHEN brace = 1 THEN ' {{' ELSE '' END,
                    CASE WHEN t <= 5 THEN '.' WHEN t = 6 THEN '!'
                         WHEN t = 7 THEN '?' WHEN t = 8 THEN '...'
                         ELSE '' END) AS line
      FROM lflag
    )"""


def _c4_line_filters(d: str) -> str:
    # C4 line keep = has terminal punctuation (t != 9; an ellipsis line
    # ends in '.', so it passes C4's rule even though Gopher counts it
    # separately) AND >= MIN_LINE_WORDS words AND no "javascript"; C4
    # doc drop = any '{' (code) or "lorem ipsum" (boilerplate) anywhere,
    # or nothing survived the line pass. cleaned_sha hashes the kept
    # lines joined by newline IN LINE ORDER — the oracle checks the
    # exact surviving bytes, not just counts.
    sha = D.sha256_("k.cleaned", d)
    keep = ("CASE WHEN s.has_brace = 0 AND s.has_lorem = 0 "
            "AND coalesce(k.kept_lines, 0) > 0 THEN 1 ELSE 0 END")
    return f"""
    WITH {_lines_cte(d)},
    kept AS (
      SELECT doc_id, ln, line FROM deco
      WHERE t != 9 AND js = 0 AND n_words >= {MIN_LINE_WORDS}
    ),
    kagg AS (
      SELECT doc_id, cast(count(*) as bigint) AS kept_lines,
             {D.ordered_string_agg('line', 'ln', 'chr(10)', d)} AS cleaned
      FROM kept GROUP BY doc_id
    ),
    dstat AS (
      SELECT doc_id, cast(count(*) as bigint) AS n_lines,
             cast(sum(CASE WHEN t = 9 THEN 1 ELSE 0 END) as bigint)
               AS no_term_lines,
             cast(sum(CASE WHEN n_words < {MIN_LINE_WORDS} THEN 1 ELSE 0
                      END) as bigint) AS short_lines,
             cast(sum(js) as bigint) AS js_lines,
             max(brace) AS has_brace, max(lorem) AS has_lorem
      FROM deco GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_lines, s.no_term_lines, s.short_lines, s.js_lines,
           cast(coalesce(k.kept_lines, 0) as bigint) AS kept_lines,
           round(cast(coalesce(k.kept_lines, 0) as double) / s.n_lines, 6)
             AS kept_frac,
           cast({keep} as bigint) AS doc_keep,
           CASE WHEN {keep} = 1 THEN {sha} ELSE NULL END AS cleaned_sha,
           CASE WHEN {keep} = 1 THEN cast(length(k.cleaned) as bigint)
                ELSE NULL END AS cleaned_chars
    FROM dstat s LEFT JOIN kagg k ON k.doc_id = s.doc_id
    """


sql_template("q_c4_line_filters", _c4_line_filters,
             "C4 cleaning rules (Raffel et al. 2020): per-line terminal "
             "punctuation / min-words / javascript filters, doc-level "
             "brace + lorem-ipsum drops, SHA-256 of the surviving text")


def _line_dedup(d: str) -> str:
    # CCNet-style exact line dedup on the UNDECORATED bodies (the
    # normalized-paragraph hash of Wenzek et al. 2020): the first
    # occurrence in (doc_id, ln) order survives. Exact-copy documents
    # chunk identically (line length is a function of the text), so the
    # later copy loses every line — kept_sha goes NULL for it and the
    # oracle hash pins that. The body-keyed window is the one corpus-wide
    # exchange; md5(body) is the shuffle key so a 10^12-line corpus
    # shuffles 16-byte keys, not line bytes.
    return f"""
    WITH {_lines_cte(d)},
    ranked AS (
      SELECT doc_id, ln, body,
             row_number() OVER (PARTITION BY md5(body)
                                ORDER BY doc_id, ln) AS rn
      FROM deco
    ),
    keptagg AS (
      SELECT doc_id, cast(count(*) as bigint) AS kept_lines,
             {D.sha256_(D.ordered_string_agg('body', 'ln', 'chr(10)', d), d)}
               AS kept_sha
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id, cast(count(*) as bigint) AS n_lines,
             cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) as bigint)
               AS dup_lines
      FROM ranked GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_lines, t.dup_lines,
           cast(coalesce(k.kept_lines, 0) as bigint) AS kept_lines,
           round(cast(t.dup_lines as double) / t.n_lines, 6)
             AS dup_frac,
           k.kept_sha
    FROM tot t LEFT JOIN keptagg k ON k.doc_id = t.doc_id
    """


sql_template("q_line_dedup", _line_dedup,
             "CCNet-style cross-corpus exact line dedup: first "
             "occurrence of each line body survives; per-doc removal "
             "counts + SHA-256 of the surviving lines")


# ---- Gopher document-quality rules ------------------------------------------

GQ_MIN_WORDS = 50        # Gopher: 50 <= word count <= 100,000
GQ_MAX_WORDS = 100_000
GQ_MIN_MWL = 3.0         # 3 <= mean word length <= 10
GQ_MAX_MWL = 10.0
GQ_MAX_SYM = 0.1         # symbol-to-word ratio ('{' + '...') < 0.1
GQ_MAX_BULLET = 0.9      # < 90% of lines start with a bullet
GQ_MAX_ELLIPSIS = 0.3    # < 30% of lines end with an ellipsis
GQ_MIN_ALPHA = 0.8       # > 80% of words contain an alphabetic char
GQ_MIN_STOP = 2          # >= 2 distinct-occurrence stop-word hits


def _gopher_quality(d: str) -> str:
    # The full Gopher §A1.1 rule set over the synthesized line view.
    # Word stats come from the token stream (one doc_id-keyed agg);
    # bullet/ellipsis/symbol fractions from the line view. The keep flag
    # is the conjunction — per-rule flags are emitted so downstream
    # mixing can re-weight instead of hard-dropping. Symbols are the
    # planted '{' and '...' occurrences (the corpus has no '#'); alpha
    # fraction uses [a-z] on the already-lowercased corpus.
    stop = "', '".join(LEXICON["en"] + LEXICON["de"])
    alpha = D.regexp_count("tok", "'[a-z]'", d)
    mwl = "round(w.mean_wl, 6)"
    sym = ("round(cast(l.braces + l.ellipsis_lines as double)"
           " / w.n_words, 6)")
    bull = "round(cast(l.bullet_lines as double) / l.n_lines, 6)"
    ell = "round(cast(l.ellipsis_lines as double) / l.n_lines, 6)"
    alp = "round(cast(w.alpha_words as double) / w.n_words, 6)"
    rules = {
        "r_words": f"w.n_words BETWEEN {GQ_MIN_WORDS} AND {GQ_MAX_WORDS}",
        "r_mwl": (f"{mwl} BETWEEN {D.dbl(GQ_MIN_MWL)} "
                  f"AND {D.dbl(GQ_MAX_MWL)}"),
        "r_sym": f"{sym} < {D.dbl(GQ_MAX_SYM)}",
        "r_bullet": f"{bull} < {D.dbl(GQ_MAX_BULLET)}",
        "r_ellipsis": f"{ell} < {D.dbl(GQ_MAX_ELLIPSIS)}",
        "r_alpha": f"{alp} > {D.dbl(GQ_MIN_ALPHA)}",
        "r_stop": f"w.stop_hits >= {GQ_MIN_STOP}",
    }
    flags = ",\n           ".join(
        f"cast(CASE WHEN {expr} THEN 1 ELSE 0 END as bigint) AS {name}"
        for name, expr in rules.items())
    conj = " AND ".join(rules.values())
    return f"""
    WITH {_lines_cte(d)},
    wstat AS (
      SELECT doc_id, cast(count(*) as bigint) AS n_words,
             avg(length(tok)) AS mean_wl,
             cast(sum(CASE WHEN tok IN ('{stop}') THEN 1 ELSE 0 END)
                  as bigint) AS stop_hits,
             cast(sum(CASE WHEN {alpha} > 0 THEN 1 ELSE 0 END) as bigint)
               AS alpha_words
      FROM pos GROUP BY doc_id
    ),
    lstat AS (
      SELECT doc_id, cast(count(*) as bigint) AS n_lines,
             cast(sum(bullet) as bigint) AS bullet_lines,
             cast(sum(CASE WHEN t = 8 THEN 1 ELSE 0 END) as bigint)
               AS ellipsis_lines,
             cast(sum(brace) as bigint) AS braces
      FROM deco GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_words, {mwl} AS mean_word_len,
           {sym} AS sym_ratio, {bull} AS bullet_frac,
           {ell} AS ellipsis_frac, {alp} AS alpha_frac,
           w.stop_hits,
           {flags},
           cast(CASE WHEN {conj} THEN 1 ELSE 0 END as bigint) AS keep
    FROM wstat w JOIN lstat l ON l.doc_id = w.doc_id
    """


sql_template("q_gopher_quality", _gopher_quality,
             "full Gopher quality rule set (Rae et al. 2021 A1.1): word "
             "count, mean word length, symbol ratio, bullet/ellipsis "
             "line fractions, alpha-word fraction, stop words + keep flag")


# ---- quality-classifier distillation (rows-only: iterative ML) --------------

def _quality_classifier_spark(spark, sf_dir):  # type: ignore[no-untyped-def]
    from unmixing_spark.text.quality_ml import quality_classifier
    return quality_classifier(spark, sf_dir)


def _register_quality_classifier() -> None:
    from unmixing_spark.queries import QuerySpec, register
    register("q_quality_classifier", QuerySpec(
        spark_fn=_quality_classifier_spark, oracle=None,
        doc="GPT-3/FineWeb-style quality classifier: pyspark.ml logistic "
            "regression over hashed-bigram counts, distilling the Gopher "
            "rule conjunction; rows-only (iterative ML), accuracy/AUC "
            "floors pinned in tests/test_quality_ml.py"))


_register_quality_classifier()
