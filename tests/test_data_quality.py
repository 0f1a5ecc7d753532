"""q_data_quality against a planted-violation fixture: every constraint
is driven through its FAILURE path (the clean synthetic corpus passes
all nine checks with metric 1.0, which exercises only the happy path).
Expected metrics are recomputed by hand in pandas."""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import spark  # noqa: F401 (fixture re-export)
from unmixing_spark.queries import registry


def _write(tmp: str, name: str, df: pd.DataFrame, schema: pa.Schema) -> None:
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False),
                   os.path.join(tmp, f"{name}.parquet"))


def test_data_quality_planted_violations(spark):  # noqa: F811
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 2, 4, 5, 6, 7],          # dup id 2
        "text": ["good text", None, "", "ok", "ok",   # null + empty
                 "five5", "x", "yy"],
        "lang": ["en", "es", "EN", "zh", "deu",       # 'EN' and 'deu' invalid
                 "fr", "it", "pt"],
        "source": ["s"] * 8,
        "n_chars": [9, 0, 0, 2, 2, 5, 1, 3],          # row1 n_chars=0 (range
                                                      # fail vs null text);
                                                      # row7 3 != len('yy')
    })
    base = datetime.datetime(2024, 1, 1)
    events = pd.DataFrame({
        "event_id": [0, 1, 2],
        "ts": [base, base + datetime.timedelta(days=400), None],  # 400d span
        "user_id": [1, 2, 3],
        "event_type": ["click", "Bad!", "signup"],    # 'Bad!' invalid
        "value": [1.0, 2.0, 3.0],
        "props": ["{}", "{}", "{}"],
    })
    emb = pd.DataFrame({
        "vec_id": [0, 1, 99],                         # 99 is an orphan
        "embedding": [[0.1, 0.2]] * 3,
        "label": [0, 1, 2],
    })
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, "documents", docs, pa.schema([
            ("doc_id", pa.int64()), ("text", pa.string()),
            ("lang", pa.string()), ("source", pa.string()),
            ("n_chars", pa.int64())]))
        _write(tmp, "events", events, pa.schema([
            ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("value", pa.float64()), ("props", pa.string())]))
        _write(tmp, "embeddings", emb, pa.schema([
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32())]))
        out = (registry()["q_data_quality"].spark_fn(spark, tmp)
               .toPandas().set_index("check_name"))

    got = {k: (round(float(r["metric"]), 6), int(r["passed"]))
           for k, r in out.iterrows()}
    n = len(docs)
    exp = {
        # 6 of 8 texts non-null AND non-empty
        "documents.text completeness": (round(6 / n, 6), 0),
        # 7 distinct ids over 8 rows
        "documents.doc_id uniqueness": (round(7 / n, 6), 0),
        # 'EN' (upper) and 'deu' (3 letters) fail the regex
        "documents.lang validity ^[a-z]{2}$": (round(6 / n, 6), 0),
        # two rows have n_chars = 0, outside [1, 100000]
        "documents.n_chars range [1,100000]": (round(6 / n, 6), 0),
        # null text never equals its n_chars; '' has len 0 != 0? (0 == 0
        # -> consistent); 'yy' claims 3. consistent rows: ids 0,2('',0),
        # 3,4,5,6 = 6
        "documents.n_chars = length(text) consistency": (round(6 / n, 6), 0),
        # one of three ts is null
        "events.ts completeness": (round(2 / 3, 6), 0),
        # 'Bad!' fails
        "events.event_type validity ^[a-z_]+$": (round(2 / 3, 6), 0),
        # span is 400 days > 366: metric = 366*86400 - 400*86400
        "events.ts freshness (span <= 1y)": (float((366 - 400) * 86400), 0),
        # one of three vec_ids has no matching doc
        "embeddings.vec_id -> documents.doc_id referential":
            (round(2 / 3, 6), 0),
    }
    assert got == exp
    # and every check FAILED on the planted fixture — the gate a
    # scheduler would read (min passed) is 0
    assert out["passed"].max() == 0


def test_data_quality_clean_corpus_passes(spark):  # noqa: F811
    out = (registry()["q_data_quality"]
           .spark_fn(spark, "/root/testdata/sf0.001").toPandas())
    assert len(out) == 9
    assert (out["passed"] == 1).all()


def test_volume_anomaly_planted_spike_and_gap(spark):  # noqa: F811
    """q_volume_anomaly on a synthetic feed with a planted 20x spike and
    a 3-day outage: the spike day is the ONLY anomaly and the day after
    the outage reports exactly the missing-day gap. Expected modified
    z-scores recomputed by hand."""
    import numpy as np

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    counts = {}
    for d in range(14):
        if d in (6, 7, 8):
            continue                       # the outage
        n = 100 + (d % 3)                  # quiet variation: 100..102
        if d == 10:
            n = 2000                       # the spike
        counts[d] = n
        day = base + datetime.timedelta(days=d)
        for i in range(n):
            rows.append((eid, day + datetime.timedelta(seconds=i),
                         1, "click", 1.0, "{}"))
            eid += 1
    events = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, "events", events, pa.schema([
            ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("value", pa.float64()), ("props", pa.string())]))
        out = (registry()["q_volume_anomaly"].spark_fn(spark, tmp)
               .toPandas().sort_values("day").reset_index(drop=True))

    vols = np.array([counts[d] for d in sorted(counts)], dtype=float)
    med = float(np.median(vols))
    mad = float(np.median(np.abs(vols - med)))
    assert len(out) == len(counts)
    assert list(out["n_events"]) == [counts[d] for d in sorted(counts)]
    for i, d in enumerate(sorted(counts)):
        z = 0.6745 * (counts[d] - med) / mad
        assert abs(float(out.loc[i, "modified_z"]) - round(z, 6)) < 1e-9
    flagged = set(out.loc[out["is_anomaly"] == 1, "day"].astype(str))
    assert flagged == {str((base + datetime.timedelta(days=10)).date())}
    gaps = dict(zip(out["day"].astype(str),
                    out["gap_days_before"].astype(int)))
    # day 9 follows the 3-day outage (days 6-8 missing)
    assert gaps[str((base + datetime.timedelta(days=9)).date())] == 3
    assert gaps[str(base.date())] == 0          # first day: no gap
    assert sum(gaps.values()) == 3              # and nothing else missing


def test_volume_anomaly_constant_feed_declared(spark):  # noqa: F811
    """MAD = 0 (perfectly constant feed): z is NULL by declaration and
    no day flags — the degenerate arm both renderings share."""
    base = datetime.datetime(2024, 3, 1)
    rows = [(d * 5 + i, base + datetime.timedelta(days=d, seconds=i),
             1, "click", 1.0, "{}")
            for d in range(6) for i in range(5)]
    events = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, "events", events, pa.schema([
            ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("value", pa.float64()), ("props", pa.string())]))
        out = (registry()["q_volume_anomaly"].spark_fn(spark, tmp)
               .toPandas())
    assert (out["n_events"] == 5).all()
    assert out["modified_z"].isna().all()
    assert (out["is_anomaly"] == 0).all()
