"""Web-search indexing operators over the documents corpus (task brief;
the reference engine has no search surface):

- q_bm25_topk — Okapi BM25 ranked retrieval (Robertson & Walker 1994;
  the SPARQL/Lucene default scoring) for a deterministic synthetic query
  set: per query, the top-10 documents by BM25 score.
- q_tfidf_keywords — per-document keyword extraction: the top-3 tokens
  by TF-IDF weight (Sparck Jones 1972), the classic doc-summary /
  related-content signal an indexer materializes next to postings.

Both dual-rendered (Spark executes, DuckDB is the driver's oracle).

Float doctrine (dialect.py): every ln() argument is an integer-valued
double (idf uses the (2N-2df+1)/(2df+1) integer split), every float
aggregate is either a single-value max() or a FIXED-ORDER sum of named
columns (the per-term contributions are pivoted onto rn-indexed columns
and added left-to-right — no order-dependent float aggregation), and
the only rounding is the final round(..., 6) applied identically in
both renderings before ranking.
"""

from __future__ import annotations

from unmixing_spark import dialect as D
from unmixing_spark.queries import QuerySpec, register, sql_template
from unmixing_spark.queries.text_q import (_dot, _lead_gram, _pos_tokens,
                                            _tokens)

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERIES = 8     # synthetic query ids 0..7
BM25_QLEN = 3        # terms per query
BM25_MIN_DF = 5      # query terms drawn from mid-frequency vocabulary
BM25_TOPK = 10
TFIDF_TOPK = 3


def _corpus_ctes(d: str) -> str:
    """Shared CTE chain: token stream → per-(doc, tok) tf, per-doc
    length, corpus stats, document-frequency lexicon.

    Scale shape (10^12 docs): ``tf`` and ``dl`` are doc_id-keyed
    aggregations with map-side combine over the token stream (the
    posting-list build's exact shape); ``lex`` is one tok-keyed
    aggregation (the dictionary build); ``stats`` is a 1-row global
    aggregate broadcast into the scorer. Nothing here is worse than the
    inverted-index construction every search engine already runs."""
    return f"""toks AS {D.mat(d)}(SELECT doc_id, tok FROM {_tokens(d)}),
    tf AS {D.mat(d)}(
      SELECT doc_id, tok, cast(count(*) as bigint) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    dl AS {D.mat(d)}(
      SELECT doc_id, cast(count(*) as bigint) AS dl
      FROM toks GROUP BY doc_id
    ),
    stats AS {D.mat(d)}(
      SELECT cast(count(*) as bigint) AS n_docs,
             cast(sum(dl) as double) / cast(count(*) as double) AS avgdl
      FROM dl
    ),
    lex AS {D.mat(d)}(
      SELECT tok, cast(count(*) as bigint) AS df
      FROM tf GROUP BY tok
    )"""


def _bm25_chain(d: str) -> str:
    """The shared BM25 CTE chain ending in ``scored``(qid, doc_id,
    score, n_hit_terms) — factored so q_search_snippets ranks with the
    SAME scorer q_bm25_topk exposes."""
    k1 = D.dbl(BM25_K1)
    b = D.dbl(BM25_B)
    qkey = f"'qt' || {D.to_str('q.qid', d)} || ':' || l.tok"
    idf = ("ln(cast(2 * s.n_docs + 2 as double)) - "
           "ln(cast(2 * qt.df + 1 as double))")
    tfnorm = (f"(cast(t.tf as double) * ({k1} + {D.dbl(1.0)})) / "
              f"(cast(t.tf as double) + {k1} * ({D.dbl(1.0)} - {b} + "
              f"{b} * cast(g.dl as double) / s.avgdl))")
    qid_rows = ", ".join(f"({q})" for q in range(BM25_QUERIES))
    pivot = " + ".join(
        f"coalesce(max(CASE WHEN rn = {r} THEN contrib END), {D.dbl(0.0)})"
        for r in range(1, BM25_QLEN + 1))
    nhit = " + ".join(
        f"max(CASE WHEN rn = {r} THEN 1 ELSE 0 END)"
        for r in range(1, BM25_QLEN + 1))
    return f"""{_corpus_ctes(d)},
    qids AS ({D.values_rel(qid_rows, "t(qid)", d)}),
    qcand AS (
      SELECT q.qid, l.tok, l.df,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY md5({qkey})) AS rn
      FROM lex l CROSS JOIN qids q
      WHERE l.df >= {BM25_MIN_DF}
    ),
    qterms AS {D.mat(d)}(
      SELECT qid, tok, df, rn FROM qcand WHERE rn <= {BM25_QLEN}
    ),
    contribs AS (
      SELECT qt.qid, t.doc_id, qt.rn,
             ({idf}) * ({tfnorm}) AS contrib
      FROM qterms qt
      JOIN tf t ON t.tok = qt.tok
      JOIN dl g ON g.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT qid, doc_id,
             round({pivot}, 6) AS score,
             cast({nhit} as bigint) AS n_hit_terms
      FROM contribs GROUP BY qid, doc_id
    )"""


def _bm25_topk(d: str) -> str:
    """BM25 top-10 per synthetic query.

    Query synthesis (sandbox stand-in for the external query log a real
    cluster reads): for each qid, the {BM25_QLEN} mid-frequency
    (df >= {BM25_MIN_DF}) vocabulary terms ranked by md5('qt'||qid||':'
    ||tok) — deterministic in both renderings, and biased away from
    df=1 hapaxes so every query actually ranks a candidate set.

    Scoring: idf = ln(1 + (N-df+0.5)/(df+0.5)) — the Lucene BM25 idf,
    strictly positive even for df > N/2 (the raw Robertson form goes
    negative there, and this corpus's common vocabulary makes that the
    typical case) — algebraically (N+1)/(df+0.5), so it renders as
    ln(2N+2) - ln(2df+1) with both ln() arguments integer-valued
    doubles; tfnorm = tf(k1+1) / (tf + k1(1-b+b*dl/avgdl)). Per-term
    contributions land on rn-indexed pivot columns and are added in
    FIXED order, so no float aggregation order exists to differ. The
    whole chain lives in _bm25_chain, shared with q_search_snippets.

    Scale shape: the query-term table is tiny (external input in
    production) — broadcast onto the tf posting stream; scoring rows are
    (qid, doc) keyed; the final top-k window per qid is the map-side
    partial top-k + merge Spark already plans for rank-limit windows
    (AQE handles a hot query's skew like any hot reduce key)."""
    return f"""
    WITH {_bm25_chain(d)}
    SELECT qid, cast(rnk as bigint) AS rank, doc_id, score, n_hit_terms
    FROM (
      SELECT qid, doc_id, score, n_hit_terms,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS rnk
      FROM scored
    ) r
    WHERE rnk <= {BM25_TOPK}
    """


def _bm25_topk_spark(spark, sf_dir):
    """q_bm25_topk's Spark side (round-6 optimization, guide §2.4/§5):
    Catalyst inlines the template's CTEs, so the token explode behind
    ``toks`` ran twice (under ``tf`` and ``dl``) and ``tf`` itself ran
    twice (under ``lex`` and ``contribs``). The (doc, tok, tf) posting
    table is materialized ONCE (eager localCheckpoint); ``dl`` is
    derived from it as sum(tf) — identical to count(*) over the token
    stream by construction — and lex/stats/scorer read the checkpointed
    postings. Same scoring expressions as the template — bit-identical
    results, DuckDB oracle text unchanged."""
    from unmixing_spark import pipeline

    pipeline.register_tables(spark, sf_dir, ("documents",))
    d = D.SPARK
    tf = spark.sql(
        f"SELECT doc_id, tok, cast(count(*) as bigint) AS tf "
        f"FROM (SELECT doc_id, tok FROM {_tokens(d)}) toks "
        f"GROUP BY doc_id, tok").localCheckpoint(eager=True)
    tf.createOrReplaceTempView("bm25_tf")
    k1 = D.dbl(BM25_K1)
    b = D.dbl(BM25_B)
    qkey = f"'qt' || {D.to_str('q.qid', d)} || ':' || l.tok"
    idf = ("ln(cast(2 * s.n_docs + 2 as double)) - "
           "ln(cast(2 * qt.df + 1 as double))")
    tfnorm = (f"(cast(t.tf as double) * ({k1} + {D.dbl(1.0)})) / "
              f"(cast(t.tf as double) + {k1} * ({D.dbl(1.0)} - {b} + "
              f"{b} * cast(g.dl as double) / s.avgdl))")
    qid_rows = ", ".join(f"({q})" for q in range(BM25_QUERIES))
    pivot = " + ".join(
        f"coalesce(max(CASE WHEN rn = {r} THEN contrib END), {D.dbl(0.0)})"
        for r in range(1, BM25_QLEN + 1))
    nhit = " + ".join(
        f"max(CASE WHEN rn = {r} THEN 1 ELSE 0 END)"
        for r in range(1, BM25_QLEN + 1))
    return spark.sql(f"""
    WITH dl AS (
      SELECT doc_id, cast(sum(tf) as bigint) AS dl
      FROM bm25_tf GROUP BY doc_id
    ),
    stats AS (
      SELECT cast(count(*) as bigint) AS n_docs,
             cast(sum(dl) as double) / cast(count(*) as double) AS avgdl
      FROM dl
    ),
    lex AS (
      SELECT tok, cast(count(*) as bigint) AS df
      FROM bm25_tf GROUP BY tok
    ),
    qids AS ({D.values_rel(qid_rows, "t(qid)", d)}),
    qcand AS (
      SELECT q.qid, l.tok, l.df,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY md5({qkey})) AS rn
      FROM lex l CROSS JOIN qids q
      WHERE l.df >= {BM25_MIN_DF}
    ),
    qterms AS (
      SELECT qid, tok, df, rn FROM qcand WHERE rn <= {BM25_QLEN}
    ),
    contribs AS (
      SELECT qt.qid, t.doc_id, qt.rn,
             ({idf}) * ({tfnorm}) AS contrib
      FROM qterms qt
      JOIN bm25_tf t ON t.tok = qt.tok
      JOIN dl g ON g.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT qid, doc_id,
             round({pivot}, 6) AS score,
             cast({nhit} as bigint) AS n_hit_terms
      FROM contribs GROUP BY qid, doc_id
    )
    SELECT qid, cast(rnk as bigint) AS rank, doc_id, score, n_hit_terms
    FROM (
      SELECT qid, doc_id, score, n_hit_terms,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS rnk
      FROM scored
    ) r
    WHERE rnk <= {BM25_TOPK}
    """)


register("q_bm25_topk", QuerySpec(
    spark_fn=_bm25_topk_spark, oracle=_bm25_topk(D.DUCKDB),
    doc="Okapi BM25 ranked retrieval: top-10 docs per synthetic "
        "query over the corpus posting lists (integer-ln idf, "
        "fixed-order per-term sums)"))


def _tfidf_keywords(d: str) -> str:
    """Per-document top-{TFIDF_TOPK} TF-IDF keywords:
    w = tf * (ln(N+1) - ln(df)), both ln() arguments integer-valued
    doubles; per-(doc, tok) weight is a single deterministic product
    (no float aggregation at all); rank by round(w, 6) DESC with tok as
    the tie-break.

    Scale shape: tf ⋈ lex is tok-keyed (the dictionary side is
    vocab-sized — broadcast when it fits, shuffle otherwise, exactly
    the posting-scorer join); the per-doc top-k window is doc_id-keyed
    — Spark plans rank-limit windows with map-side partial top-k, so
    no doc's full token set crosses the wire past the first exchange."""
    w = ("cast(t.tf as double) * "
         "(ln(cast(s.n_docs + 1 as double)) - ln(cast(l.df as double)))")
    return f"""
    WITH {_corpus_ctes(d)},
    weighted AS (
      SELECT t.doc_id, t.tok, t.tf, l.df,
             round({w}, 6) AS weight
      FROM tf t
      JOIN lex l ON l.tok = t.tok
      CROSS JOIN stats s
    )
    SELECT doc_id, cast(rnk as bigint) AS rank, tok,
           cast(tf as bigint) AS tf, cast(df as bigint) AS df, weight
    FROM (
      SELECT doc_id, tok, tf, df, weight,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY weight DESC, tok) AS rnk
      FROM weighted
    ) r
    WHERE rnk <= {TFIDF_TOPK}
    """


sql_template("q_tfidf_keywords", _tfidf_keywords,
             "per-document keyword extraction: top-3 tokens by TF-IDF "
             "weight (integer-ln idf, deterministic tie-break)")


def _posting_lists(d: str) -> str:
    """The inverted-index build itself — the physical artifact BM25
    reads: per term, document frequency, collection frequency, and the
    delta-encoded posting list ("gap:tf" entries in doc_id order, gaps
    from the previous posting — the standard d-gap compression input;
    Witten/Moffat/Bell, Managing Gigabytes ch. 3). The SHA-256 of the
    postings string pins the exact bytes an index segment would write.

    Scale shape: THE canonical indexer shuffle — one tok-keyed exchange
    of the (doc, tok, tf) stream; the lag window and the ordered
    aggregation both run inside that single partitioning (Spark plans
    them in one stage after the exchange). At 10^12 docs hot terms make
    skewed partitions — real indexers split a hot term's postings into
    range-sharded segment runs (tok, doc_id-range), which is this same
    query with a bucketed composite key; the corpus here has no term
    anywhere near a task-sized posting."""
    gap = ("doc_id - lag(doc_id, 1, 0) OVER "
           "(PARTITION BY tok ORDER BY doc_id)")
    entry = f"{D.to_str('gap', d)} || ':' || {D.to_str('tf', d)}"
    return f"""
    WITH {_corpus_ctes(d)},
    gapped AS (
      SELECT tok, doc_id, tf, {gap} AS gap FROM tf
    ),
    lists AS (
      SELECT tok,
             cast(count(*) as bigint) AS df,
             cast(sum(tf) as bigint) AS cf,
             cast(min(doc_id) as bigint) AS first_doc,
             {D.ordered_string_agg(entry, 'doc_id', "' '", d)} AS postings
      FROM gapped GROUP BY tok
    )
    SELECT tok, df, cf, first_doc, postings,
           {D.sha256_('postings', d)} AS postings_sha
    FROM lists
    """


sql_template("q_posting_lists", _posting_lists,
             "inverted-index posting lists: per term df/cf + the "
             "delta-encoded (gap:tf) posting string in doc order, "
             "SHA-256 pinned",
             repartition=False)


CONT_N = 4        # token shingle length for containment
CONT_DF_CAP = 8   # blocking grams: shingles in <= this many docs
CONT_MIN = 0.5    # report pairs where containment(a in b) >= this


def _shingle_containment(d: str) -> str:
    """Directed shingle CONTAINMENT (Broder 1997, "On the resemblance
    and containment of documents"): C(A,B) = |S(A) ∩ S(B)| / |S(A)| over
    distinct token {CONT_N}-shingles — the asymmetric sibling of the
    Jaccard resemblance q_ngram_jaccard computes, and the signal that
    catches quotes/wrapped copies resemblance misses (a short doc fully
    contained in a long one has high C but low Jaccard).

    Blocking is PART OF THE SPEC: candidate pairs share at least one
    RARE shingle (document frequency <= {CONT_DF_CAP}) — the Manku-style
    rare-feature blocking that keeps candidate generation O(docs x rare
    grams) instead of all-pairs; a pair whose every shared shingle is
    corpus-common is declared out of scope (those pairs are boilerplate
    overlap, q_boilerplate_ngrams' business, not containment). The
    pytest pin replicates the blocking exactly AND verifies the planted
    exact-copy pairs all surface with C = 1 both ways.

    Scale shape: shingle stream is one doc_id window; the df table is
    gram-keyed; the candidate self-join runs only on <=CAP buckets
    (bounded fan-out per gram, hot grams excluded BY THE SPEC — the cap
    is the skew guard); the intersection count joins the two gram
    streams pair-keyed. No all-pairs anywhere."""
    return f"""
    WITH pos AS (SELECT doc_id, pos, tok FROM {_pos_tokens(d)}),
    ng AS {D.mat(d)}(
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id, {_lead_gram(CONT_N)} AS gram
        FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) t
      WHERE gram IS NOT NULL
    ),
    gsize AS {D.mat(d)}(
      SELECT doc_id, cast(count(*) as bigint) AS n_sh
      FROM ng GROUP BY doc_id
    ),
    rare AS (
      SELECT gram FROM ng GROUP BY gram
      HAVING count(*) <= {CONT_DF_CAP} AND count(*) >= 2
    ),
    cand AS {D.mat(d)}(
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ng a
      JOIN rare r ON r.gram = a.gram
      JOIN ng b ON b.gram = a.gram AND b.doc_id <> a.doc_id
    ),
    shared AS (
      SELECT c.doc_a, c.doc_b, cast(count(*) as bigint) AS n_shared
      FROM cand c
      JOIN ng ga ON ga.doc_id = c.doc_a
      JOIN ng gb ON gb.doc_id = c.doc_b AND gb.gram = ga.gram
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT s.doc_a, s.doc_b, s.n_shared, z.n_sh AS n_sh_a,
           round(cast(s.n_shared as double) / cast(z.n_sh as double), 6)
             AS containment
    FROM shared s
    JOIN gsize z ON z.doc_id = s.doc_a
    WHERE cast(s.n_shared as double) / cast(z.n_sh as double)
          >= {D.dbl(CONT_MIN)}
    """


SNIP_W = 10      # snippet window length in tokens
SNIP_DOCS = 3    # snippet the top-N BM25 docs per query


def _search_snippets(d: str) -> str:
    """Result-snippet generation — the SERP step after ranking: for each
    query's top-{SNIP_DOCS} BM25 documents, the best {SNIP_W}-token
    window (most query-term hit POSITIONS in [p, p+{SNIP_W - 1}];
    ties -> earliest window), with the snippet text rebuilt in position
    order and SHA-256 pinned. Luhn 1958's significant-word window — the
    shape every search engine's highlighter runs.

    Scale shape: ranking reuses the BM25 chain; the snippet pass
    touches ONLY the ranked (qid, doc) pairs (8 x {SNIP_DOCS} here;
    page-size x queries in production) — hit positions come from a
    broadcast of those pairs onto the position stream, the per-window
    hit count is a RANGE-frame window inside the (qid, doc) partition,
    and the snippet rebuild joins the token stream doc-keyed. Nothing
    corpus-sized moves except the position-stream scan."""
    return f"""
    WITH pos AS {D.mat(d)}(SELECT doc_id, pos, tok FROM {_pos_tokens(d)}),
    {_bm25_chain(d)},
    top AS {D.mat(d)}(
      SELECT qid, doc_id, score, rnk FROM (
        SELECT qid, doc_id, score,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, doc_id) AS rnk
        FROM scored) r
      WHERE rnk <= {SNIP_DOCS}
    ),
    hits AS (
      SELECT t.qid, t.doc_id, p.pos
      FROM top t
      JOIN qterms qt ON qt.qid = t.qid
      JOIN pos p ON p.doc_id = t.doc_id AND p.tok = qt.tok
    ),
    winned AS (
      SELECT qid, doc_id, pos AS win_start,
             count(*) OVER (PARTITION BY qid, doc_id ORDER BY pos
                            RANGE BETWEEN CURRENT ROW
                                  AND {SNIP_W - 1} FOLLOWING) AS n_hits
      FROM hits
    ),
    best AS {D.mat(d)}(
      SELECT qid, doc_id, win_start, n_hits FROM (
        SELECT qid, doc_id, win_start, n_hits,
               row_number() OVER (PARTITION BY qid, doc_id
                                  ORDER BY n_hits DESC, win_start) AS rn
        FROM winned) w
      WHERE rn = 1
    ),
    snip AS (
      SELECT b.qid, b.doc_id, b.win_start, b.n_hits,
             {D.ordered_string_agg('p.tok', 'p.pos', "' '", d)} AS snippet
      FROM best b
      JOIN pos p ON p.doc_id = b.doc_id
       AND p.pos BETWEEN b.win_start AND b.win_start + {SNIP_W - 1}
      GROUP BY b.qid, b.doc_id, b.win_start, b.n_hits
    )
    SELECT t.qid, t.rnk AS rank, t.doc_id, t.score,
           s.win_start, cast(s.n_hits as bigint) AS n_hits,
           s.snippet, {D.sha256_('s.snippet', d)} AS snippet_sha
    FROM top t JOIN snip s ON s.qid = t.qid AND s.doc_id = t.doc_id
    """


sql_template("q_search_snippets", _search_snippets,
             "SERP snippet generation: best query-term window per "
             "top-ranked doc (RANGE-frame hit counts, earliest-tie), "
             "snippet text rebuilt in position order and SHA-256 pinned")


SPELL_MAX_DIST = 2   # candidate corrections within edit distance 2


def _query_spellfix(d: str) -> str:
    """Query spell correction ("did you mean") — the vocabulary-backed
    edit-distance corrector every search frontend runs: each synthetic
    misspelling (the BM25 query terms with one deterministically chosen
    character deleted) is matched against the corpus lexicon within
    edit distance {SPELL_MAX_DIST}; the winner is the nearest candidate
    with document frequency then lexicographic order breaking ties —
    the Norvig ranking with df as the language-model prior. The
    ``recovered`` column proves in-query whether correction inverted
    the mutation (a mutation landing nearer ANOTHER vocab word
    legitimately reads 0 — the pin checks the exact set).

    Both engines ship ``levenshtein`` natively (identical classic DP
    semantics — the pin re-verifies against a pure-Python DP).

    Scale shape: the misspelling list is query-log-sized (external
    input in production) and broadcasts onto the lexicon; the length
    prefilter (|len diff| <= {SPELL_MAX_DIST}) bounds the per-term
    candidate set the same way real spellers band their dictionaries
    (a trigram-index prefilter at 10^8-word vocabularies — same
    query with one more join)."""
    qkey = f"'qt' || {D.to_str('q.qid', d)} || ':' || l.tok"
    p = f"1 + ({D.md5_slice(chr(39) + 'sp' + chr(39) + ' || tok', 1, d)}) % (length(tok) - 1)"
    miss = "substr(tok, 1, p - 1) || substr(tok, p + 1)"
    return f"""
    WITH {_corpus_ctes(d)},
    qids AS ({D.values_rel(', '.join(f'({q})' for q in range(BM25_QUERIES)), 't(qid)', d)}),
    qcand AS (
      SELECT q.qid, l.tok,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY md5({qkey})) AS rn
      FROM lex l CROSS JOIN qids q
      WHERE l.df >= {BM25_MIN_DF} AND length(l.tok) >= 3
    ),
    misspelled AS {D.mat(d)}(
      SELECT DISTINCT tok AS original, {miss} AS miss
      FROM (SELECT tok, {p} AS p FROM qcand WHERE rn <= {BM25_QLEN}) t
    ),
    cand AS (
      SELECT m.original, m.miss, l.tok AS fix, l.df,
             levenshtein(m.miss, l.tok) AS dist
      FROM misspelled m
      JOIN lex l ON abs(length(l.tok) - length(m.miss))
                    <= {SPELL_MAX_DIST}
      WHERE levenshtein(m.miss, l.tok) <= {SPELL_MAX_DIST}
    )
    SELECT original, miss, fix AS corrected,
           cast(dist as bigint) AS dist, cast(df as bigint) AS df,
           cast(CASE WHEN fix = original THEN 1 ELSE 0 END as bigint)
             AS recovered
    FROM (
      SELECT original, miss, fix, df, dist,
             row_number() OVER (PARTITION BY original, miss
                                ORDER BY dist, df DESC, fix) AS rn
      FROM cand
    ) r
    WHERE rn = 1
    """


sql_template("q_query_spellfix", _query_spellfix,
             "query spell correction: edit-distance-bounded lexicon "
             "match with df-prior tie-breaking (native levenshtein in "
             "both engines), in-query recovery proof")


sql_template("q_shingle_containment", _shingle_containment,
             "directed shingle containment (Broder 1997) via rare-gram "
             "blocking: |S(A) n S(B)| / |S(A)| >= 0.5 pairs — catches "
             "quote/wrapped-copy relations Jaccard resemblance misses")


# ---- prefix autocomplete index --------------------------------------------------

AC_MAX_PFX = 6  # index prefixes of length 1..6 (serving systems cap the
                # indexed depth: longer prefixes resolve via the posting
                # list / linear scan of the tiny completion set)
AC_TOP_K = 5    # completions kept per prefix


def _autocomplete(d: str) -> str:
    """Prefix-autocomplete index (the search-serving companion to
    q_query_spellfix): for every token prefix of length 1..AC_MAX_PFX,
    the top-AC_TOP_K completions by corpus frequency, ties to the
    lexicographically smaller token — what a suggest-as-you-type box
    serves from one sorted lookup. Excludes the degenerate
    prefix == token rows only when the token IS its own sole completion
    information (kept: a full-length token is still a valid completion
    of its own prefix — standard behavior).

    Scale shape: ONE corpus pass builds the token->freq table
    (map-side combinable, vocabulary-sized); the prefix explosion is a
    constant-fan (<= AC_MAX_PFX) VALUES join over THAT table, never the
    corpus; the per-prefix top-k is a rank window over prefix groups of
    vocabulary-bounded size. At 10^12 pages nothing after the first
    aggregation touches corpus-scale data."""
    len_rows = ", ".join(f"({k})" for k in range(1, AC_MAX_PFX + 1))
    return f"""
    WITH tf AS (
      SELECT tok, cast(count(*) as bigint) AS freq
      FROM {_tokens(d)} t
      WHERE tok <> ''
      GROUP BY tok
    ),
    lens AS ({D.values_rel(len_rows, "t(k)", d)}),
    pfx AS (
      SELECT substr(tf.tok, 1, l.k) AS prefix, tf.tok, tf.freq
      FROM tf JOIN lens l ON l.k <= length(tf.tok)
    ),
    ranked AS (
      SELECT prefix, tok, freq,
             row_number() OVER (PARTITION BY prefix
                                ORDER BY freq DESC, tok) AS rnk
      FROM pfx
    )
    SELECT prefix, cast(rnk as int) AS rnk, tok AS completion, freq
    FROM ranked WHERE rnk <= {AC_TOP_K}
    """


sql_template("q_autocomplete", _autocomplete,
             "prefix-autocomplete index: top-k completions per 1..6-char "
             "token prefix by corpus frequency, built from one corpus "
             "pass over a vocabulary-sized table")


# ---- MMR result diversification -------------------------------------------------

MMR_QUERIES = 3   # first N vec_ids are the query set (q_ann_topk style)
MMR_POOL = 8      # relevance-ranked candidate pool per query
MMR_K = 4         # results selected per query
MMR_LAMBDA = 0.7  # relevance-vs-diversity trade-off


def _mmr_diversify(d: str) -> str:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick K results per query maximizing
    lambda*rel(c) - (1-lambda)*max_{s in selected} sim(c, s) — the
    standard serving-side diversification pass over an ANN candidate
    pool (duplicate-ish hits about the same page farm collapse to one
    slot). The greedy loop is FIXED at K rounds and unrolled in the
    single dual-rendered template (the q_nfindr doctrine: a bounded
    iterative algorithm over a bounded candidate set is expressible as
    chained CTEs in both engines).

    Scale shape: the only corpus-scale work is the relevance scoring
    that builds the per-query pool (the q_ann_cosine_topk theta-join —
    at 10^12 docs the LSH/IVF candidate generators replace it); every
    MMR round operates on pool-sized relations (queries x POOL rows,
    pairwise queries x POOL^2), i.e. serving-cache scale. Floats: every
    cosine is the shared sequential-fold dot product, every score one
    identically-written IEEE chain, argmax ties to the smaller vec_id;
    output scores round(6)."""
    import textwrap
    rel_dot = _dot(d, "q.embedding", "c.embedding")
    nq = _dot(d, "q.embedding", "q.embedding")
    nc = _dot(d, "c.embedding", "c.embedding")
    rel = f"({rel_dot}) / nullif(sqrt({nq}) * sqrt({nc}), 0)"
    pair_dot = _dot(d, "a.embedding", "b.embedding")
    na = _dot(d, "a.embedding", "a.embedding")
    nb = _dot(d, "b.embedding", "b.embedding")
    psim = f"({pair_dot}) / nullif(sqrt({na}) * sqrt({nb}), 0)"
    lam, one_m = D.dbl(MMR_LAMBDA), D.dbl(1.0 - MMR_LAMBDA)
    ctes = [f"""pool AS {D.mat(d)}(
      SELECT query_id, cand, rel, embedding FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand,
               {rel} AS rel, c.embedding,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {rel} DESC, c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {MMR_QUERIES}) t
      WHERE rn <= {MMR_POOL})""", f"""pair AS {D.mat(d)}(
      SELECT a.query_id, a.cand AS c1, b.cand AS c2, {psim} AS sim
      FROM pool a JOIN pool b
        ON b.query_id = a.query_id AND b.cand <> a.cand)""", f"""sel1 AS {D.mat(d)}(
      SELECT query_id, cand, {lam} * rel AS mmr FROM (
        SELECT query_id, cand, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand) AS rn
        FROM pool) t WHERE rn = 1)"""]
    union = "SELECT query_id, cand, 1 AS rnk, mmr FROM sel1"
    for r in range(2, MMR_K + 1):
        picked = " UNION ALL ".join(
            f"SELECT query_id, cand FROM sel{i}" for i in range(1, r))
        ctes.append(f"""picked{r} AS {D.mat(d)}({picked})""")
        ctes.append(f"""sc{r} AS {D.mat(d)}(
      SELECT p.query_id, p.cand,
             {lam} * p.rel - {one_m} * max(pr.sim) AS mmr
      FROM pool p
      JOIN picked{r} k ON k.query_id = p.query_id
      JOIN pair pr ON pr.query_id = p.query_id
                  AND pr.c1 = p.cand AND pr.c2 = k.cand
      WHERE NOT EXISTS (SELECT 1 FROM picked{r} x
                        WHERE x.query_id = p.query_id
                          AND x.cand = p.cand)
      GROUP BY p.query_id, p.cand, p.rel)""")
        ctes.append(f"""sel{r} AS {D.mat(d)}(
      SELECT query_id, cand, mmr FROM (
        SELECT query_id, cand, mmr,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY mmr DESC, cand) AS rn
        FROM sc{r}) t WHERE rn = 1)""")
        union += (f" UNION ALL SELECT query_id, cand, {r} AS rnk, mmr "
                  f"FROM sel{r}")
    joined = ",\n    ".join(ctes)
    return textwrap.dedent(f"""
    WITH {joined}
    SELECT query_id, cast(rnk as int) AS rnk, cand AS hit_id,
           round(mmr, 6) AS mmr_score
    FROM ({union}) u
    """)


sql_template("q_mmr_diversify", _mmr_diversify,
             "MMR result diversification (Carbonell-Goldstein) over the "
             "ANN candidate pool: fixed-K greedy unrolled in one "
             "dual-rendered template, pool-sized work per round",
             tables=("embeddings",))


# ---- reciprocal rank fusion (hybrid retrieval) -----------------------------------

RRF_QUERIES = 3   # query-by-example: first N vec_ids, text from the
                  # matching documents row
RRF_K = 60        # the standard RRF damping constant (Cormack et al.)
RRF_TOPK = 5


def _rrf_hybrid(d: str) -> str:
    """Hybrid retrieval fused by Reciprocal Rank Fusion (Cormack,
    Clarke & Buettcher 2009) — the standard way production search
    combines a lexical ranking with a dense (embedding) ranking without
    score calibration: fused(c) = sum over systems of 1/(K + rank_s(c)).
    Query-by-example form: each query is a document (vec_id < N), its
    dense ranking is embedding cosine, its lexical ranking is distinct-
    token overlap. A document missing from one system's list simply
    contributes nothing for that system (the defining RRF property —
    rank fusion tolerates disjoint candidate sets).

    Scale shape: the dense side is the ANN pool build (LSH/IVF at
    corpus scale); the lexical side is one tok-keyed join between the
    BROADCAST query-token table and the corpus token stream + a
    (query, doc) count — the posting-list probe shape. Ranks are
    integers, the fused score is a sum of exact reciprocals of
    integers — one identically-written IEEE chain, round(9)."""
    dot = _dot(d, "q.embedding", "c.embedding")
    nq = _dot(d, "q.embedding", "q.embedding")
    nc = _dot(d, "c.embedding", "c.embedding")
    cos = f"({dot}) / nullif(sqrt({nq}) * sqrt({nc}), 0)"
    one = D.dbl(1.0)
    return f"""
    WITH dense AS {D.mat(d)}(
      SELECT q.vec_id AS query_id, c.vec_id AS cand,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos} DESC, c.vec_id) AS r_dense
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {RRF_QUERIES}
    ),
    qtok AS {D.mat(d)}(
      SELECT DISTINCT doc_id AS query_id, tok
      FROM {_tokens(d)} t WHERE doc_id < {RRF_QUERIES} AND tok <> ''
    ),
    ctok AS (
      SELECT DISTINCT doc_id AS cand, tok
      FROM {_tokens(d)} t WHERE tok <> ''
    ),
    lex AS {D.mat(d)}(
      SELECT query_id, cand, r_lex FROM (
        SELECT q.query_id, c.cand,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY count(*) DESC, c.cand) AS r_lex
        FROM qtok q JOIN ctok c ON c.tok = q.tok
        WHERE c.cand <> q.query_id
        GROUP BY q.query_id, c.cand) t
    ),
    fused AS (
      SELECT coalesce(dn.query_id, lx.query_id) AS query_id,
             coalesce(dn.cand, lx.cand) AS cand,
             CASE WHEN dn.r_dense IS NULL THEN {D.dbl(0.0)}
                  ELSE {one} / cast({RRF_K} + dn.r_dense as double) END
           + CASE WHEN lx.r_lex IS NULL THEN {D.dbl(0.0)}
                  ELSE {one} / cast({RRF_K} + lx.r_lex as double) END
               AS score,
             dn.r_dense, lx.r_lex
      FROM dense dn
      FULL OUTER JOIN lex lx
        ON lx.query_id = dn.query_id AND lx.cand = dn.cand
    )
    SELECT query_id, cast(rn as int) AS rnk, cand AS hit_id,
           round(score, 9) AS rrf_score,
           cast(r_dense as bigint) AS r_dense,
           cast(r_lex as bigint) AS r_lex
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, cand) AS rn
      FROM fused) t
    WHERE rn <= {RRF_TOPK}
    """


sql_template("q_rrf_hybrid", _rrf_hybrid,
             "hybrid lexical+dense retrieval fused by reciprocal rank "
             "fusion (1/(K+rank) sums, disjoint-list tolerant) in "
             "query-by-example form",
             tables=("documents", "embeddings"))


# ---- retrieval evaluation (nDCG / MRR) --------------------------------------------

RE_QUERIES = 4  # query-by-example: first N vec_ids
RE_K = 10       # evaluation cutoff


def _retrieval_eval(d: str) -> str:
    """Ranking-quality evaluation of the dense retriever — nDCG@K and
    MRR@K (Järvelin & Kekäläinen 2002; the two numbers every search
    team tracks per release): binary relevance = same cluster label as
    the query (the embeddings table's label column), ranking = cosine.
    The discount constants 1/log2(r+1) and their prefix sums (the IDCG
    ladder) are emitted as LITERAL tables computed once in Python —
    both engines consume identical doubles, so no cross-engine libm
    (log2) divergence can exist by construction.

    Scale shape: ranking is the ANN pool build; everything downstream
    joins rank-cutoff rows (queries x K) against two constant tables.
    Per-query relevant-count is one label-keyed aggregate."""
    import math as _m
    gains = {r: 1.0 / _m.log2(r + 1) for r in range(1, RE_K + 1)}
    cums, acc = {}, 0.0
    for r in range(1, RE_K + 1):
        acc += gains[r]
        cums[r] = acc
    gain_rows = ", ".join(f"({r}, {D.dbl(gains[r])})"
                          for r in range(1, RE_K + 1))
    cum_rows = ", ".join(f"({m}, {D.dbl(cums[m])})"
                         for m in range(1, RE_K + 1))
    dot = _dot(d, "q.embedding", "c.embedding")
    nq = _dot(d, "q.embedding", "q.embedding")
    nc = _dot(d, "c.embedding", "c.embedding")
    cos = f"({dot}) / nullif(sqrt({nq}) * sqrt({nc}), 0)"
    z = D.dbl(0.0)
    return f"""
    WITH gains AS ({D.values_rel(gain_rows, "t(r, g)", d)}),
    idcg AS ({D.values_rel(cum_rows, "t(m, v)", d)}),
    ranked AS {D.mat(d)}(
      SELECT query_id, cand, rel, rn FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand,
               cast(CASE WHEN c.label = q.label THEN 1 ELSE 0 END as int)
                 AS rel,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos} DESC, c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {RE_QUERIES}) t
      WHERE rn <= {RE_K}
    ),
    lab AS (
      SELECT label, cast(count(*) as bigint) AS cnt
      FROM embeddings GROUP BY label
    ),
    nrel AS {D.mat(d)}(
      SELECT q.vec_id AS query_id, l.cnt - 1 AS n_rel
      FROM embeddings q JOIN lab l ON l.label = q.label
      WHERE q.vec_id < {RE_QUERIES}
    ),
    peraq AS (
      SELECT r.query_id,
             sum(CASE WHEN r.rel = 1 THEN g.g ELSE {z} END) AS dcg,
             cast(sum(r.rel) as bigint) AS hits_at_k,
             min(CASE WHEN r.rel = 1 THEN r.rn END) AS first_rel
      FROM ranked r JOIN gains g ON g.r = r.rn
      GROUP BY r.query_id
    )
    SELECT p.query_id,
           n.n_rel,
           p.hits_at_k,
           round(p.dcg, 9) AS dcg,
           round(CASE WHEN n.n_rel = 0 THEN {z}
                      ELSE p.dcg / i.v END, 9) AS ndcg,
           round(CASE WHEN p.first_rel IS NULL THEN {z}
                      ELSE {D.dbl(1.0)} / cast(p.first_rel as double) END,
                 9) AS mrr,
           cast(p.first_rel as bigint) AS first_rel_rank
    FROM peraq p
    JOIN nrel n ON n.query_id = p.query_id
    LEFT JOIN idcg i ON i.m = least(cast(n.n_rel as bigint), {RE_K})
    """


sql_template("q_retrieval_eval", _retrieval_eval,
             "retrieval evaluation: nDCG@10 and MRR@10 of the dense "
             "ranking against cluster-label relevance, with literal "
             "discount/IDCG tables for exact cross-engine parity",
             tables=("embeddings",))
