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

from tests.conftest import SF_SMALL, spark  # noqa: F401 (fixture re-export)
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
        # 99 is an orphan; vec_id=2 matches the DUPLICATED doc_id and
        # must still count exactly once (no join fan-out)
        "vec_id": [0, 1, 2, 99],
        "embedding": [[0.1, 0.2]] * 4,
        "label": [0, 1, 2, 3],
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
        # one of FOUR vec_ids has no matching doc; vec_id=2 hits the
        # duplicated doc_id but counts once (DISTINCT build side)
        "embeddings.vec_id -> documents.doc_id referential":
            (round(3 / 4, 6), 0),
    }
    assert got == exp
    # and every check FAILED on the planted fixture — the gate a
    # scheduler would read (min passed) is 0
    assert out["passed"].max() == 0


def test_data_quality_clean_corpus_passes(spark):  # noqa: F811
    out = (registry()["q_data_quality"]
           .spark_fn(spark, SF_SMALL).toPandas())
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
    rows.append((eid, None, 1, "click", 1.0, "{}"))  # NULL ts: excluded
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


def _ev(rows):
    return pd.DataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, (u, ts, t) in enumerate(rows)],
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"])


def _write_events(tmp, events):
    _write(tmp, "events", events, pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())]))


def test_funnel_strict_ordering_semantics(spark):  # noqa: F811
    """The strict-order funnel's defining cases: purchase BEFORE click
    does not count; click with no prior view leaves the user at step 0;
    an out-of-order early step is ignored in favor of the earliest
    valid one."""
    base = datetime.datetime(2024, 5, 1)

    def t(m):
        return base + datetime.timedelta(minutes=m)

    rows = [
        # user 1: clean view -> click -> purchase
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: purchase FIRST, then view -> click (no purchase after)
        (2, t(0), "purchase"), (2, t(1), "view"), (2, t(2), "click"),
        # user 3: click only — never viewed, stays at 0
        (3, t(0), "click"), (3, t(1), "click"),
        # user 4: view only
        (4, t(0), "view"),
        # user 5: view -> purchase (skipped click) — stays at 1
        (5, t(0), "view"), (5, t(1), "purchase"),
        # user 6: click -> view -> click -> purchase: first click is
        # pre-view and ignored; the SECOND click anchors the purchase
        (6, t(0), "click"), (6, t(1), "view"), (6, t(2), "click"),
        (6, t(3), "purchase"),
        # user 7: only errors — in the user universe, step 0
        (7, t(0), "error"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(tmp, _ev(rows))
        out = (registry()["q_funnel_steps"].spark_fn(spark, tmp)
               .toPandas().set_index("user_id"))
    assert dict(out["reached"]) == {1: 3, 2: 2, 3: 0, 4: 1, 5: 1, 6: 3, 7: 0}
    # user 6's click anchor is the post-view one
    assert out.loc[6, "ts_click"] == t(2)
    assert out.loc[2, "ts_purchase"] is None or pd.isna(
        out.loc[2, "ts_purchase"])


def test_retention_cohort_grid(spark):  # noqa: F811
    """Hand-built cohorts: day-0 cohort of two users (one returns at d1
    and d7, one never), day-3 cohort of one user returning at d14 only."""
    base = datetime.datetime(2024, 5, 1, 12, 0)

    def day(k, u):
        return base + datetime.timedelta(days=k, minutes=u)

    rows = [
        (1, day(0, 1), "view"), (1, day(1, 1), "click"),
        (1, day(7, 1), "view"),
        (2, day(0, 2), "view"),
        (3, day(3, 3), "view"), (3, day(17, 3), "purchase"),  # 3 + 14
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(tmp, _ev(rows))
        out = (registry()["q_retention_cohorts"].spark_fn(spark, tmp)
               .toPandas())
        out["cohort_day"] = out["cohort_day"].astype(str)
        out = out.set_index("cohort_day")
    d0, d3 = "2024-05-01", "2024-05-04"
    assert int(out.loc[d0, "cohort_size"]) == 2
    assert int(out.loc[d0, "retained_d1"]) == 1
    assert int(out.loc[d0, "retained_d7"]) == 1
    assert int(out.loc[d0, "retained_d14"]) == 0
    assert abs(float(out.loc[d0, "rate_d1"]) - 0.5) < 1e-9
    assert int(out.loc[d3, "cohort_size"]) == 1
    assert int(out.loc[d3, "retained_d1"]) == 0
    assert int(out.loc[d3, "retained_d14"]) == 1
    assert abs(float(out.loc[d3, "rate_d14"]) - 1.0) < 1e-9


def test_event_transitions_session_gap_excluded(spark):  # noqa: F811
    """Hand-built flows: within-session consecutive pairs count, the
    pair straddling a >30-min gap does not, and P(to|from) rows
    normalize per from_type."""
    base = datetime.datetime(2024, 6, 1)

    def t(m):
        return base + datetime.timedelta(minutes=m)

    rows = [
        # user 1, one session: view -> click -> purchase
        (1, t(0), "view"), (1, t(5), "click"), (1, t(10), "purchase"),
        # user 1, NEW session 2h later: view -> click
        (1, t(130), "view"), (1, t(135), "click"),
        # user 2: view -> view -> click
        (2, t(0), "view"), (2, t(1), "view"), (2, t(2), "click"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(tmp, _ev(rows))
        out = (registry()["q_event_transitions"].spark_fn(spark, tmp)
               .toPandas())
    got = {(r["from_type"], r["to_type"]): (int(r["n"]), float(r["p"]))
           for _, r in out.iterrows()}
    # purchase -> view (the 120-min gap) must NOT appear
    exp = {
        ("view", "click"): (3, 0.75),      # u1 s1, u1 s2, u2
        ("view", "view"): (1, 0.25),       # u2
        ("click", "purchase"): (1, 1.0),   # u1 s1
    }
    assert got == exp
