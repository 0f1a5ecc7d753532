"""Randomized cross-engine parity for dialect.py helpers.

dialect.py is the backbone of all full-value oracles: every dual-rendered
template assumes each helper computes the SAME function in Spark SQL and
DuckDB. The oracle harness only ever exercises them on the synthetic
corpus's narrow alphabet (31 lowercase tokens, single spaces) — this test
drives the string helpers with seeded adversarial strings (unicode,
quotes, backslashes, regex metacharacters, newlines/tabs/CRLF, empty and
whitespace-only values) and the integer/timestamp helpers with boundary
values, comparing the two engines' outputs exactly.

NUL is excluded from the alphabet: DuckDB VARCHAR rejects embedded NUL at
ingest, so no dual-rendered template can ever receive one.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import spark  # noqa: F401 (fixture re-export)
from unmixing_spark import dialect as D

ALPHA = list("abcXYZ019 .,*+?[](){}|^$\\'\"\n\r\t-_/:%#@") + [
    "é", "ß", "中", "日", "🚀", " ", " "]


def _rand_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "   ", "\n", "\t\t", "a", "..."]
    while len(out) < n:
        out.append("".join(rng.choice(ALPHA)
                           for _ in range(rng.randrange(0, 30))))
    return out[:n]


def _both(spark, tmp: str, pdf: pd.DataFrame, spark_sql: str,
          duck_sql: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    path = os.path.join(tmp, "t.parquet")
    pdf.to_parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("fz")
    got_s = spark.sql(spark_sql).toPandas().sort_values("id")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW fz AS SELECT * FROM '{path}'")
    got_d = con.sql(duck_sql).df().sort_values("id")
    return got_s.reset_index(drop=True), got_d.reset_index(drop=True)


def _assert_col_equal(a: pd.DataFrame, b: pd.DataFrame, col: str,
                      label: str) -> None:
    av, bv = list(a[col]), list(b[col])
    for i, (x, y) in enumerate(zip(av, bv)):
        if pd.isna(x) and pd.isna(y):
            continue
        assert x == y, (label, i, repr(x), repr(y))


def test_string_helpers_parity_fuzz(spark):  # noqa: F811
    """md5_slice, sha256_, ws_split, line_split, regexp_count,
    regexp_replace_all, to_binary round-trip, binary_len — exact
    agreement on 200 adversarial strings."""
    pdf = pd.DataFrame({"id": range(200), "s": _rand_strings(200, 20260819)})

    def battery(d: str) -> str:
        joiner = "array_join" if d == D.SPARK else "array_to_string"
        rx_word = D.rx_lit(r"[a-z]+", d)
        rx_ws = D.rx_lit(r"\s+", d)
        return f"""
        SELECT id,
               {D.md5_slice('s', 1, d)}  AS h1,
               {D.md5_slice('s', 9, d)}  AS h9,
               {D.sha256_('s', d)}       AS sha,
               {joiner}({D.ws_split('s', d)}, chr(30))   AS toks,
               {joiner}({D.line_split('s', d)}, chr(30)) AS lines,
               {D.regexp_count('s', rx_word, d)}         AS words,
               {D.regexp_replace_all('s', rx_ws, "'_'", d)} AS squashed,
               {D.from_binary(D.to_binary('s', d), d)}   AS rt,
               {D.binary_len(D.to_binary('s', d), d)}    AS blen
        FROM fz
        """

    with tempfile.TemporaryDirectory() as tmp:
        a, b = _both(spark, tmp, pdf, battery(D.SPARK), battery(D.DUCKDB))
    for col in ("h1", "h9", "sha", "toks", "lines", "words",
                "squashed", "rt", "blen"):
        _assert_col_equal(a, b, col, col)
    # the round-trip is also identity
    assert list(a["rt"]) == list(pdf["s"])


def test_host_and_json_helpers_parity_fuzz(spark):  # noqa: F811
    """canon_host / host_surt over generated authorities (mixed case,
    ports, www, empty labels) and json_get over strings that need real
    JSON escaping."""
    rng = random.Random(7)
    labels = ["WWW", "www", "Sub", "ex-ample", "a", "xn--bcher-kva",
              "", "中文"]
    hosts, jsons = [], []
    for i in range(150):
        h = ".".join(rng.choice(labels)
                     for _ in range(rng.randrange(1, 5)))
        if rng.random() < 0.4:
            h += f":{rng.randrange(1, 65536)}"
        hosts.append(h)
        payload = {"k": _rand_strings(1, 1000 + i)[0]}
        if rng.random() < 0.2:
            payload = {"other": 1}          # missing key -> NULL both sides
        jsons.append(json.dumps(payload, ensure_ascii=False))
    pdf = pd.DataFrame({"id": range(150), "h": hosts, "j": jsons})

    def battery(d: str) -> str:
        return f"""
        SELECT id,
               {D.canon_host('h')}        AS canon,
               {D.host_surt(D.canon_host('h'), d)} AS surt,
               {D.json_get('j', 'k', d)}  AS jk
        FROM fz
        """

    with tempfile.TemporaryDirectory() as tmp:
        a, b = _both(spark, tmp, pdf, battery(D.SPARK), battery(D.DUCKDB))
    for col in ("canon", "surt", "jk"):
        _assert_col_equal(a, b, col, col)


def test_numeric_and_ts_helpers_parity_fuzz(spark):  # noqa: F811
    """hex2int on random hex8, xor_/idiv_i on boundary bigints,
    epoch_to_ts -> ts_compact formatting, and the ts_to_epoch round-trip."""
    rng = random.Random(99)
    hexes = ["00000000", "ffffffff", "7fffffff", "80000000"] + [
        "".join(rng.choice("0123456789abcdef") for _ in range(8))
        for _ in range(96)]
    big = [0, 1, 2, 2**31 - 1, 2**31, 2**52 - 1] + [
        rng.randrange(0, 2**52) for _ in range(94)]
    div = [rng.randrange(1, 10**6) for _ in range(100)]
    epoch = [0, 1, 86399, 86400, 2**31 - 1] + [
        rng.randrange(0, 4 * 10**9) for _ in range(95)]
    pdf = pd.DataFrame({"id": range(100), "hx": hexes, "a": big,
                        "b": div, "ep": epoch})

    def battery(d: str) -> str:
        return f"""
        SELECT id,
               {D.hex2int('hx', d)}                     AS hv,
               {D.xor_('a', 'b', d)}                    AS x,
               {D.idiv_i('a', 'b', d)}                  AS q,
               {D.idiv('a', 'b')}                       AS qf,
               {D.ts_compact(D.epoch_to_ts('ep', d), d)} AS t14,
               {D.ts_to_epoch(D.epoch_to_ts('ep', d), d)} AS ep_rt
        FROM fz
        """

    with tempfile.TemporaryDirectory() as tmp:
        a, b = _both(spark, tmp, pdf, battery(D.SPARK), battery(D.DUCKDB))
    for col in ("hv", "x", "q", "qf", "t14", "ep_rt"):
        _assert_col_equal(a, b, col, col)
    assert [int(v) for v in a["ep_rt"]] == list(pdf["ep"])  # round-trip


def test_group_agg_helpers_parity_fuzz(spark):  # noqa: F811
    """median_ (interpolated, odd AND even group sizes, negative and
    repeated values) and ordered_string_agg (adversarial strings, unique
    integer order keys, non-empty groups per the helper's contract) —
    exact agreement across 40 groups."""
    rng = random.Random(4242)
    strs = _rand_strings(400, 31337)
    rows = []
    rid = 0
    for g in range(40):
        size = rng.randrange(1, 12)         # odd and even sizes
        for k in range(size):
            rows.append((rid, g, k,
                         rng.randrange(-10**6, 10**6),
                         strs[rid % len(strs)].replace("\x1e", "")))
            rid += 1
    pdf = pd.DataFrame(rows, columns=["id", "g", "k", "v", "s"])

    def battery(d: str) -> str:
        return f"""
        SELECT g AS id,
               round({D.median_('v', d)}, 9) AS med,
               {D.ordered_string_agg('s', 'k', 'chr(30)', d)} AS agg
        FROM fz GROUP BY g
        """

    with tempfile.TemporaryDirectory() as tmp:
        a, b = _both(spark, tmp, pdf, battery(D.SPARK), battery(D.DUCKDB))
    _assert_col_equal(a, b, "med", "median")
    _assert_col_equal(a, b, "agg", "ordered_string_agg")
    # and both equal the numpy/python ground truth
    import numpy as np
    gt_med = pdf.groupby("g")["v"].apply(
        lambda v: round(float(np.median(v)), 9))
    gt_agg = (pdf.sort_values(["g", "k"]).groupby("g")["s"]
              .apply(lambda s: "\x1e".join(s)))
    assert dict(zip(a["id"], a["med"])) == dict(gt_med)
    assert dict(zip(a["id"], a["agg"])) == dict(gt_agg)
