"""q_gopher_repetition / q_boilerplate_ngrams vs an independent numpy
brute force (the dual-rendered SQL shares its logic between dialects, so
dialect parity alone can't catch a wrong metric — this pins the metric)."""

from __future__ import annotations

import re

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry


def _docs():
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def _brute_repetition(text: str):
    toks = re.split(r"\s+", text)
    n = len(toks)
    grams = [(i, f"{toks[i]} {toks[i + 1]}") for i in range(n - 1)]
    counts: dict[str, int] = {}
    for _, g in grams:
        counts[g] = counts.get(g, 0) + 1
    top_covered: set[int] = set()
    if counts:
        # same tie-break as the SQL: max count, then smallest gram
        top_gram = min(counts, key=lambda g: (-counts[g], g))
        for i, g in grams:
            if g == top_gram:
                top_covered.update((i, i + 1))
    dup_covered: set[int] = set()
    for i, g in grams:
        if counts[g] > 1:
            dup_covered.update((i, i + 1))
    return (n, round(len(top_covered) / n, 6), round(len(dup_covered) / n, 6))


def test_gopher_repetition_matches_brute_force(spark):
    out = (registry()["q_gopher_repetition"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    docs = _docs()
    assert len(out) == len(docs)
    for _, row in docs.iterrows():
        n, top2, dup2 = _brute_repetition(row["text"])
        got = out.loc[row["doc_id"]]
        assert int(got["n_tok"]) == n
        assert abs(got["top2_frac"] - top2) < 1e-9, row["doc_id"]
        assert abs(got["dup2_frac"] - dup2) < 1e-9, row["doc_id"]
    # the corpus must actually exercise the interval-union branch, and
    # both metrics are true coverage fractions (bounded — the naive
    # count*2/n_tok formula exceeds 1.0 on repetitive docs)
    assert (out["dup2_frac"] > 0).sum() > 100
    assert (out["top2_frac"] <= 1.0).all() and (out["dup2_frac"] <= 1.0).all()


def test_boilerplate_ngrams_matches_brute_force(spark):
    from unmixing_spark.queries.text_q import BOILER_DF, BOILER_N

    out = (registry()["q_boilerplate_ngrams"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    docs = _docs()
    per_doc: dict[int, list[str]] = {}
    df_count: dict[str, set[int]] = {}
    for _, row in docs.iterrows():
        toks = re.split(r"\s+", row["text"])
        grams = [" ".join(toks[i:i + BOILER_N])
                 for i in range(len(toks) - BOILER_N + 1)]
        per_doc[row["doc_id"]] = grams
        for g in set(grams):
            df_count.setdefault(g, set()).add(row["doc_id"])
    boiler = {g for g, ids in df_count.items() if len(ids) >= BOILER_DF}
    assert boiler, "corpus must exercise the boilerplate branch"
    for doc_id, grams in per_doc.items():
        if not grams:
            continue
        hits = sum(1 for g in grams if g in boiler)
        got = out.loc[doc_id]
        assert int(got["n_grams5"]) == len(grams)
        assert int(got["boiler_hits"]) == hits
        assert abs(got["boiler_frac"] - round(hits / len(grams), 6)) < 1e-9


def test_neardup_components_match_union_find(spark):
    """Spark CC vs an independent union-find over the same candidate
    pairs, plus the in-query convergence proof."""
    import duckdb

    from unmixing_spark import dialect as D
    from unmixing_spark.queries.text_q import _minhash_lsh

    out = (registry()["q_neardup_components"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    assert (out["converged"] == 1).all()

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

    comp_of = {d: find(d) for d in out.index}
    sizes: dict[int, int] = {}
    for c in comp_of.values():
        sizes[c] = sizes.get(c, 0) + 1
    for doc_id, row in out.iterrows():
        assert int(row["component"]) == comp_of[doc_id]
        assert int(row["comp_size"]) == sizes[comp_of[doc_id]]
        assert int(row["keep"]) == (1 if doc_id == comp_of[doc_id] else 0)
    # transitive closure must actually differ from the greedy rule (keep
    # docs with no smaller-id neighbor) on this corpus — chains exist, so
    # CC keeps strictly fewer docs; otherwise this query adds nothing
    # over q_minhash_dedup_keep
    greedy_keepers = set(out.index) - {b for _, b in pairs}
    assert int(out["keep"].sum()) < len(greedy_keepers)


def test_cc_labels_long_path_converges(spark):
    """Planted path graph with diameter far beyond the old fixed
    7-round unroll's 2^7 - 1 = 127-hop cover: the adaptive loop must
    iterate until the component minimum has travelled the full path and
    return a PROVEN fixpoint (every label == 0) instead of stale labels
    flagged unconverged."""
    from pyspark.sql import functions as F

    from unmixing_spark.queries.scale_q import cc_labels

    n_nodes = 300  # min label travels 299 hops -> needs ~9 doubling rounds
    path = spark.range(n_nodes - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    edges = path.unionAll(path.select(F.col("v").alias("u"),
                                      F.col("u").alias("v")))
    labels, rounds = cc_labels(edges)
    rows = labels.select("id", "lbl", "prev").toPandas()
    assert len(rows) == n_nodes
    assert (rows["lbl"] == 0).all()
    assert (rows["prev"] == rows["lbl"]).all()  # the in-query proof holds
    assert rounds > 7  # the old unroll could not have finished this graph


def test_cc_labels_round_cap_raises(spark):
    """Past max_rounds the loop must fail loudly, never hand back
    stale labels."""
    import pytest
    from pyspark.sql import functions as F

    from unmixing_spark.queries.scale_q import cc_labels

    path = spark.range(40).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    edges = path.unionAll(path.select(F.col("v").alias("u"),
                                      F.col("u").alias("v")))
    with pytest.raises(RuntimeError, match="stale component labels"):
        cc_labels(edges, max_rounds=2)  # 2^2 - 1 = 3-hop cover < 40 hops


def test_whitespace_class_tokenization_parity(spark, tmp_path):
    """The token-based operators must stay dialect-parity-green on text
    containing tabs, newlines, and runs of mixed whitespace — the
    synthetic corpus is single-spaced, so the standard oracle run can't
    exercise the \\s+ split class. Injects messy whitespace into a slice
    of the real corpus and replays the driver comparison on it."""
    import duckdb

    from tests.oracle_harness import compare
    from unmixing_spark.queries import registry

    docs = _docs().head(40).copy()
    texts = list(docs["text"])
    for i in range(len(texts)):
        t = texts[i].split(" ")
        glued = []
        seps = ["\t", "\n", "  ", " \t ", "\r\n", " "]
        for j, tok in enumerate(t):
            glued.append(tok)
            glued.append(seps[(i + j) % len(seps)])
        texts[i] = "".join(glued[:-1])
    docs["text"] = texts
    docs["n_chars"] = docs["text"].str.len()
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet", index=False)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    reg = registry()
    import __spark_entry__ as ent
    oracles = ent.oracle_sql()
    token_queries = ["q_token_count", "q_quality_score", "q_doc_fingerprint",
                     "q_gopher_repetition", "q_boilerplate_ngrams",
                     "q_sequence_packing", "q_decontaminate"]
    for name in token_queries:
        sdf = reg[name].spark_fn(spark, sf_dir).toPandas()
        ddf = con.sql(oracles[name]).df()
        problems = compare(sdf, ddf)
        assert not problems, f"{name}: {problems}"
        assert len(sdf) > 0, name
    # the messy fixture must actually change the token counts vs a
    # space-only split (i.e. the test is not vacuous)
    tc = reg["q_token_count"].spark_fn(spark, sf_dir).toPandas()
    naive = docs["text"].str.split(" ").str.len()
    assert (tc.sort_values("doc_id")["ws_tokens"].to_numpy()
            != naive.to_numpy()).any()


def _md5_rank(doc_id: int) -> int:
    import hashlib
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def test_stratified_sample_matches_brute_force(spark):
    from unmixing_spark.queries.text_q import STRATUM_QUOTA

    out = (registry()["q_stratified_sample"].spark_fn(spark, SF_SMALL)
           .toPandas())
    docs = _docs()
    docs["rank"] = [(_md5_rank(i), i) for i in docs["doc_id"]]
    expect = (docs.sort_values("rank")
              .groupby(["lang", "source"]).head(STRATUM_QUOTA))
    assert set(out["doc_id"]) == set(expect["doc_id"])
    assert (out.groupby(["lang", "source"])["doc_id"].count()
            <= STRATUM_QUOTA).all()


def test_sequence_packing_matches_brute_force(spark):
    import re

    from unmixing_spark.queries.text_q import PACK_BUDGET

    out = (registry()["q_sequence_packing"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id"))
    docs = _docs().sort_values("doc_id")
    cum: dict[str, int] = {}
    for _, row in docs.iterrows():
        n = len(re.split(r"\s+", row["text"]))
        prefix = cum.get(row["lang"], 0)
        cum[row["lang"]] = prefix + n
        got = out.loc[row["doc_id"]]
        assert int(got["tokens"]) == n
        assert int(got["seq_id"]) == prefix // PACK_BUDGET
        assert int(got["seq_offset"]) == prefix % PACK_BUDGET
        assert int(got["boundary_crossings"]) == (
            (prefix + n) // PACK_BUDGET - prefix // PACK_BUDGET)
    # packing must produce multi-sequence output and straddling docs
    assert out["seq_id"].max() > 10
    assert (out["boundary_crossings"] > 0).any()


def test_decontaminate_matches_brute_force(spark):
    import re

    from unmixing_spark.queries.text_q import DECON_EVAL_MOD, DECON_N

    out = (registry()["q_decontaminate"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id"))
    docs = _docs()
    grams_of = {}
    for _, row in docs.iterrows():
        toks = re.split(r"\s+", row["text"])
        grams_of[row["doc_id"]] = [" ".join(toks[i:i + DECON_N])
                                   for i in range(len(toks) - DECON_N + 1)]
    ev = set()
    for doc_id, grams in grams_of.items():
        if doc_id % DECON_EVAL_MOD == 0:
            ev.update(grams)
    n_contaminated = 0
    for doc_id, grams in grams_of.items():
        if doc_id % DECON_EVAL_MOD == 0 or not grams:
            continue
        hits = sum(1 for g in grams if g in ev)
        got = out.loc[doc_id]
        assert int(got["shared_gram_hits"]) == hits
        assert int(got["contaminated"]) == (1 if hits else 0)
        n_contaminated += 1 if hits else 0
    assert n_contaminated > 0   # the corpus must exercise the flag


def test_zipf_vocab_matches_brute_force(spark):
    import math

    from unmixing_spark.queries.text_q import LEXICON, ZIPF_TOP

    out = (registry()["q_zipf_vocab"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("rnk").reset_index(drop=True))
    counts: dict[str, int] = {}
    for _, row in _docs().iterrows():
        for t in re.split(r"\s+", row["text"]):
            counts[t] = counts.get(t, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    n_tok = sum(counts.values())
    lex = {w for ws in LEXICON.values() for w in ws}
    oov = sum(c for t, c in counts.items() if t not in lex)
    xs = [math.log(r + 1) for r in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(ranked)
    sx, sy = round(sum(xs), 6), round(sum(ys), 6)
    sxy = round(sum(x * y for x, y in zip(xs, ys)), 6)
    sxx = round(sum(x * x for x in xs), 6)
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert len(out) == min(ZIPF_TOP, n)
    for i in range(len(out)):
        assert out.loc[i, "tok"] == ranked[i][0]
        assert int(out.loc[i, "c"]) == ranked[i][1]
        assert abs(float(out.loc[i, "freq"])
                   - round(ranked[i][1] / n_tok, 6)) < 1e-9
    assert int(out.loc[0, "vocab"]) == n
    assert int(out.loc[0, "n_tok"]) == n_tok
    assert abs(float(out.loc[0, "oov_rate"])
               - round(oov / n_tok, 6)) < 1e-9
    assert abs(float(out.loc[0, "zipf_slope"]) - slope) < 1e-5
    # the fit is a genuine decay on any realistic token distribution
    assert float(out.loc[0, "zipf_slope"]) < 0


def test_chunk_overlap_matches_brute_force(spark):
    import hashlib

    from unmixing_spark.queries.text_q import CHUNK_S, CHUNK_W

    out = (registry()["q_chunk_overlap"].spark_fn(spark, SF_SMALL)
           .toPandas())
    got = {(int(r["doc_id"]), int(r["chunk_id"])):
           (int(r["start_tok"]), int(r["chunk_toks"]), r["chunk_sha"])
           for _, r in out.iterrows()}
    expect = {}
    multi = covered = 0
    for _, row in _docs().iterrows():
        toks = re.split(r"\s+", row["text"])
        n = len(toks)
        n_chunks = 1 + max(0, -(-(n - CHUNK_W) // CHUNK_S))
        multi += n_chunks > 1
        seen = set()
        for k in range(n_chunks):
            s = 1 + k * CHUNK_S
            e = min(s + CHUNK_W - 1, n)
            chunk = " ".join(toks[s - 1:e])
            expect[(row["doc_id"], k)] = (
                s, e - s + 1, hashlib.sha256(chunk.encode()).hexdigest())
            seen.update(range(s, e + 1))
        covered += seen == set(range(1, n + 1))
    assert got == expect
    assert multi > 0, "corpus must exercise multi-chunk docs"
    assert covered == len(_docs()), "chunks must cover every token"


def test_token_entropy_matches_brute_force(spark):
    """Entropy and normalized entropy equal a plain-Python recompute of
    H = ln(N) - (1/N) sum c ln c, with the documented rounding."""
    import math
    from collections import Counter

    out = (registry()["q_token_entropy"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    docs = _docs()
    assert len(out) == len(docs)
    for row in docs.itertuples():
        c = Counter(re.split(r"\s+", row.text))
        n = sum(c.values())
        sum_clnc = round(sum(k * math.log(k) for k in c.values()), 6)
        h = round(math.log(n) - sum_clnc / n, 6)
        norm = (round((math.log(n) - sum_clnc / n) / math.log(len(c)), 6)
                if len(c) > 1 else 0.0)
        got = out.loc[int(row.doc_id)]
        assert int(got["n_tok"]) == n
        assert int(got["n_distinct"]) == len(c)
        assert abs(got["entropy"] - h) < 1e-9, row.doc_id
        assert abs(got["norm_entropy"] - norm) < 1e-9, row.doc_id
    # invariants: 0 <= H <= ln(n_distinct) => 0 <= norm <= 1
    assert (out["entropy"] >= -1e-9).all()
    assert (out["norm_entropy"] <= 1 + 1e-9).all()


def test_ngram_novelty_matches_brute_force(spark):
    """q_ngram_novelty vs a pure-Python replay: distinct trigrams per doc,
    first-occurrence attribution by min doc_id, per-doc novel fraction."""
    docs = _docs().sort_values("doc_id")
    per_doc: dict[int, set[str]] = {}
    for _, r in docs.iterrows():
        toks = re.split(r"\s+", r["text"])
        grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        per_doc[int(r["doc_id"])] = grams
    first: dict[str, int] = {}
    for d in sorted(per_doc):
        for g in per_doc[d]:
            if g not in first:
                first[g] = d
    out = (registry()["q_ngram_novelty"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    # only docs with >= 3 tokens appear
    exp_ids = sorted(d for d in per_doc if per_doc[d])
    assert list(out["doc_id"].astype(int)) == exp_ids
    for _, r in out.iterrows():
        d = int(r["doc_id"])
        novel = sum(1 for g in per_doc[d] if first[g] == d)
        assert int(r["n_distinct_grams"]) == len(per_doc[d])
        assert int(r["novel_grams"]) == novel
        assert abs(float(r["novelty_frac"])
                   - round(novel / len(per_doc[d]), 6)) < 1e-9
    # doc 0 introduces everything it contains; later docs decay — the
    # curve must actually fall on a 31-token-vocab synthetic corpus
    first_frac = float(out.loc[0, "novelty_frac"])
    tail_mean = float(out["novelty_frac"].iloc[-100:].mean())
    assert first_frac == 1.0
    assert tail_mean < 0.5 * first_frac
