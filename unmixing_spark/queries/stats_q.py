"""Corpus-statistics operators a 100 TB pipeline runs as standing reports
(task brief; the reference has no text surface):

- q_heavy_hitters — count-min-sketch heavy hitters (Cormode & Muthukrishnan
  2005): the frequency sketch a streaming/sharded vocabulary monitor
  maintains, audited in-query against exact counts (the CMS estimate is
  provably an upper bound; the overestimate column measures collision
  error on an intentionally tight sketch).
- q_length_quantiles — exact per-language token-length quantiles
  (percentile_disc semantics), the report that calibrates length-filter
  thresholds (e.g. Gopher's 50-token floor) per language.
- q_cdc_chunks — content-defined chunking (Muthitacharoen et al. 2001,
  LBFS; the FastCDC/rsync family) at token granularity: rolling-hash
  boundaries + chunk-level dedup accounting, the storage-side dedup that
  survives insertions/edits where fixed-size blocking breaks.

All dual-rendered (Spark executes, DuckDB is the driver's oracle),
exact-integer arithmetic throughout except declared rounded means.
"""

from __future__ import annotations

from unmixing_spark import dialect as D
from unmixing_spark.queries import sql_template
from unmixing_spark.queries.text_q import _pos_tokens, _tokens

# ---- count-min-sketch heavy hitters -----------------------------------------

CMS_D = 4    # hash rows
CMS_W = 16   # buckets per row — intentionally tight vs the corpus vocab
             # (31 tokens at sf0.001) so bucket collisions actually fire
             # and the overestimate audit is non-vacuous; production
             # sizes w = ceil(e/eps) for an eps*N error bound
HH_TOP = 25  # heavy hitters reported


def _cms_bucket(tok_expr: str, seed_expr: str, d: str) -> str:
    """Row-``seed`` CMS bucket of ``tok_expr``: first 8 hex chars of
    md5(seed || '#' || tok) mod CMS_W — an independent-per-seed hash
    family, identical bigint arithmetic in both dialects."""
    h = D.hex2int(f"substr(md5({seed_expr} || '#' || {tok_expr}), 1, 8)", d)
    return f"(({h}) % {CMS_W})"


def _heavy_hitters(d: str) -> str:
    """Scale shape: the sketch build is the 100 TB path — a (row, bucket)
    keyed aggregation over the token stream that map-side-combines to
    CMS_D * CMS_W cells per partition before any exchange, so the shuffle
    moves O(d*w) rows per task regardless of corpus size (this mergeability
    is the point of CMS: per-shard sketches sum cell-wise). The exact
    ``tf`` table exists only as the audit/top-k side at toy scale; a real
    deployment queries the sketch alone. Estimates join the tiny cell
    table (broadcast-size by construction)."""
    seeds = ", ".join(f"({i})" for i in range(CMS_D))
    si = D.to_str("s.i", d)
    return f"""
    WITH toks AS {D.mat(d)}(SELECT tok FROM {_tokens(d)}),
    seeds AS ({D.values_rel(seeds, "s(i)", d)}),
    cells AS {D.mat(d)}(
      SELECT s.i, {_cms_bucket('t.tok', si, d)} AS b,
             cast(count(*) as bigint) AS cell
      FROM toks t CROSS JOIN seeds s
      GROUP BY s.i, {_cms_bucket('t.tok', si, d)}
    ),
    tf AS (
      SELECT tok, cast(count(*) as bigint) AS c
      FROM toks GROUP BY tok
    ),
    est AS (
      SELECT f.tok, f.c, min(cl.cell) AS est
      FROM tf f
      CROSS JOIN seeds s
      JOIN cells cl ON cl.i = s.i AND cl.b = {_cms_bucket('f.tok', si, d)}
      GROUP BY f.tok, f.c
    )
    SELECT cast(rnk as bigint)       AS rank,
           tok,
           cast(c as bigint)         AS exact_cnt,
           cast(est as bigint)       AS cms_est,
           cast(est - c as bigint)   AS overestimate,
           cast(CASE WHEN est >= c THEN 1 ELSE 0 END as bigint) AS ub_ok
    FROM (SELECT tok, c, est,
                 row_number() OVER (ORDER BY c DESC, tok) AS rnk
          FROM est) z
    WHERE rnk <= {HH_TOP}
    """


sql_template("q_heavy_hitters", _heavy_hitters,
             "count-min-sketch heavy hitters (Cormode & Muthukrishnan "
             "2005): mergeable d x w integer sketch vs exact counts, "
             "upper-bound property audited in-query")


# ---- exact per-language length quantiles -------------------------------------

LQ_PCTS = (25, 50, 75, 90, 99)


def _length_quantiles(d: str) -> str:
    """percentile_disc(q) = the value at row ceil(q*n) of the per-lang
    token-count order — rendered as ONE rank window shared by every
    quantile (the engines' own percentile functions differ in
    interpolation, so the disc semantics is spelled out). Scale shape:
    one lang-keyed exchange + per-lang sort, the same physical shape the
    built-in window would run; at 10^12 docs the standing report swaps
    to approx_percentile (t-digest) — this exact form is also the oracle
    such a sketch would be audited against. mean_toks divides two exact
    integers once, so the rounded double is order-independent."""
    ntok = (f"size({D.ws_split('text', d)})" if d == D.SPARK
            else f"len({D.ws_split('text', d)})")
    picks = ",\n           ".join(
        f"max(CASE WHEN rn = {D.idiv_i(f'{p} * n + 99', '100', d)} "
        f"THEN n_toks END) AS p{p}_toks" for p in LQ_PCTS)
    return f"""
    WITH base AS (
      SELECT lang, doc_id, cast({ntok} as bigint) AS n_toks
      FROM documents
    ),
    r AS (
      SELECT lang, n_toks,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_toks, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n,
             sum(n_toks) OVER (PARTITION BY lang) AS s
      FROM base
    )
    SELECT lang,
           cast(max(n) as bigint) AS n_docs,
           {picks},
           round(cast(max(s) as double) / cast(max(n) as double), 6)
             AS mean_toks
    FROM r GROUP BY lang
    """


sql_template("q_length_quantiles", _length_quantiles,
             "exact per-language token-count quantiles "
             "(percentile_disc via one rank window) + exact-ratio mean")


# ---- content-defined chunking ------------------------------------------------

CDC_W = 3    # rolling-hash window (tokens) — the boundary decision sees
             # only the last CDC_W tokens, which is what makes chunk
             # boundaries LOCAL (an edit re-chunks O(1) chunks, the CDC
             # property fixed-size blocking lacks)
CDC_MOD = 8  # boundary when h % CDC_MOD == 0 → expected chunk ~8 tokens


def _cdc_chunks(d: str) -> str:
    """Token-level content-defined chunking + chunk-level dedup report.
    A position ends a chunk iff the rolling hash of the CDC_W-token
    window ending there is 0 mod CDC_MOD (positions < CDC_W never cut, a
    min-size floor). Chunks group by content hash corpus-wide; per doc
    the report counts chunks/tokens sitting in duplicated chunks (copies
    >= 2 anywhere) and in cross-document duplicates specifically.

    Scale shape: boundary hashing and chunk assembly are doc_id-keyed
    windows (ONE exchange the token stream pays once); the duplicate
    table is a chunk-hash-keyed aggregation (map-side combined) joined
    back hash-keyed — exactly the exact-dedup shuffle shape, no
    all-pairs. The chunk-hash table is the big exchange at 100 TB, as in
    any CAS/dedup store."""
    gram = " || ' ' || ".join(
        [f"lag(tok, {k}) OVER w" for k in range(CDC_W - 1, 0, -1)] + ["tok"])
    h = D.hex2int("substr(md5(gram), 1, 8)", d)
    return f"""
    WITH pos AS (SELECT doc_id, pos, tok FROM {_pos_tokens(d)}),
    rh AS (
      SELECT doc_id, pos, tok,
             CASE WHEN gram IS NOT NULL AND ({h}) % {CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS cuts_after
      FROM (SELECT doc_id, pos, tok, {gram} AS gram
            FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
    ),
    st AS (
      SELECT doc_id, pos, tok,
             CASE WHEN lag(pos) OVER w2 IS NULL
                       OR lag(cuts_after) OVER w2 = 1
                  THEN 1 ELSE 0 END AS starts
      FROM rh WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
    ),
    ch AS (
      SELECT doc_id, pos, tok,
             sum(starts) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS chunk_idx
      FROM st
    ),
    chunks AS {D.mat(d)}(
      SELECT doc_id, chunk_idx,
             cast(count(*) as bigint) AS n_toks,
             md5({D.ordered_string_agg('tok', 'pos', "' '", d)})
               AS chunk_md5
      FROM ch GROUP BY doc_id, chunk_idx
    ),
    dup AS (
      SELECT chunk_md5,
             cast(count(*) as bigint) AS copies,
             cast(count(DISTINCT doc_id) as bigint) AS nd
      FROM chunks GROUP BY chunk_md5
    )
    SELECT c.doc_id,
           cast(count(*) as bigint)      AS n_chunks,
           cast(sum(c.n_toks) as bigint) AS n_toks,
           cast(sum(CASE WHEN u.copies >= 2 THEN 1 ELSE 0 END) as bigint)
             AS dup_chunks,
           cast(sum(CASE WHEN u.copies >= 2 THEN c.n_toks ELSE 0 END)
                as bigint) AS dup_toks,
           cast(sum(CASE WHEN u.nd >= 2 THEN c.n_toks ELSE 0 END)
                as bigint) AS crossdoc_dup_toks
    FROM chunks c JOIN dup u ON u.chunk_md5 = c.chunk_md5
    GROUP BY c.doc_id
    """


sql_template("q_cdc_chunks", _cdc_chunks,
             "content-defined chunking (LBFS/FastCDC family) at token "
             "granularity: rolling-hash boundaries, chunk-level dedup "
             "accounting per doc")
