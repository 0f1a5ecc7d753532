"""q_interval_join vs the naive pandas theta-join: the bucket-blocked
equi-join decomposition must reproduce the O(|E|*|W|) BETWEEN-join result
exactly (counts, distinct users, fixed-point sums) — a blocking bug shared
by both SQL renderings cannot hide from this pin."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.queries.complete_q import IJ_MOD, IJ_WIN_S


def test_interval_join_matches_naive_theta_join(spark):
    out = (registry()["q_interval_join"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("window_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    unit = {"datetime64[us]": 10 ** 6,
            "datetime64[ns]": 10 ** 9}[str(ev["ts"].dtype)]
    ev["ep"] = ev["ts"].astype("int64") // unit  # truncating floor
    ev["v_micro"] = [int(math.floor(v * 1e6 + 0.5)) for v in ev["value"]]
    wins = ev[ev["event_id"] % IJ_MOD == 0]
    rows = []
    for _, w in wins.iterrows():
        lo, hi = int(w["ep"]), int(w["ep"]) + IJ_WIN_S
        hits = ev[(ev["ep"] >= lo) & (ev["ep"] < hi)]
        rows.append({"window_id": int(w["event_id"]), "start_epoch": lo,
                     "n_events": len(hits),
                     "n_users": hits["user_id"].nunique(),
                     "sum_value_micro": int(hits["v_micro"].sum())})
    expect = (pd.DataFrame(rows).sort_values("window_id")
              .reset_index(drop=True))
    assert len(out) == len(expect) > 0
    for c in expect.columns:
        assert list(out[c].astype(int)) == list(expect[c].astype(int)), c
    # every window contains at least its opener; some window spans
    # multiple blocking buckets' worth of events (non-vacuous blocking)
    assert (out["n_events"] >= 1).all()
    assert out["n_events"].max() > 1
    exp_sum = expect["sum_value_micro"] / 1e6
    assert (out["sum_value"] - exp_sum.round(6)).abs().max() <= 1e-9


def test_scd2_compaction_matches_brute_force(spark):
    """q_scd2_compaction vs a pure-Python changelog walk: no-op collapse,
    versioning, half-open intervals, and the SCD2 invariants (tiling,
    exactly one current row per user)."""
    from unmixing_spark.queries.complete_q import SCD2_OPEN_US

    out = (registry()["q_scd2_compaction"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values(["user_id", "version"])
           .reset_index(drop=True))
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    unit = {"datetime64[us]": 1, "datetime64[ns]": 1000}[str(ev["ts"].dtype)]
    ev["us"] = ev["ts"].astype("int64") // unit
    rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        hist = []
        for _, r in g.iterrows():
            if not hist or hist[-1][1] != r["event_type"]:
                hist.append((int(r["us"]), r["event_type"]))
        for i, (us, typ) in enumerate(hist):
            to = hist[i + 1][0] if i + 1 < len(hist) else SCD2_OPEN_US
            rows.append({"user_id": int(uid), "event_type": typ,
                         "version": i + 1, "valid_from_us": us,
                         "valid_to_us": to,
                         "is_current": int(i + 1 == len(hist))})
    expect = (pd.DataFrame(rows).sort_values(["user_id", "version"])
              .reset_index(drop=True))
    assert len(out) == len(expect) > 0
    for c in expect.columns:
        if c == "event_type":
            assert list(out[c]) == list(expect[c]), c
        else:
            assert list(out[c].astype(int)) == list(expect[c].astype(int)), c
    # SCD2 invariants: per-user intervals tile without gap or overlap,
    # and exactly one open/current row each
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("version")
        assert (g["valid_to_us"].iloc[:-1].values
                == g["valid_from_us"].iloc[1:].values).all()
        assert g["is_current"].sum() == 1
        assert g["is_current"].iloc[-1] == 1
        assert g["valid_to_us"].iloc[-1] == SCD2_OPEN_US
    # no-op collapse is non-vacuous: some user actually changed type
    assert (out.groupby("user_id")["version"].max() > 1).any()


def test_temporal_join_matches_brute_force(spark):
    """q_temporal_join vs a pandas point-in-time lookup built from the
    SCD2 brute-force history (exactly one version governs each matched
    probe; pre-history probes report matched=0)."""
    out = (registry()["q_temporal_join"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("o_orderkey").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    unit = {"datetime64[us]": 1, "datetime64[ns]": 1000}[str(ev["ts"].dtype)]
    ev["us"] = ev["ts"].astype("int64") // unit
    hist: dict[int, list[tuple[int, str, int]]] = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        h: list[tuple[int, str, int]] = []
        for _, r in g.iterrows():
            if not h or h[-1][1] != r["event_type"]:
                h.append((int(r["us"]), r["event_type"], len(h) + 1))
        hist[int(uid)] = h
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    assert len(out) == len(orders)
    # probe instants are emitted by the query; the pin re-derives only
    # the governing-version lookup (including the open current row)
    n_matched = n_unmatched = 0
    for _, r in out.iterrows():
        uid, us = int(r["user_id"]), int(r["probe_us"])
        governing = None
        for frm, typ, ver in hist.get(uid, []):
            if us >= frm:
                governing = (typ, ver, 1)
        expect = governing if governing else (None, 0, 0)
        assert (int(r["dim_version"]), int(r["matched"])) \
            == (expect[1], expect[2]), r["o_orderkey"]
        if expect[2]:
            assert r["state_at_order"] == expect[0]
            n_matched += 1
        else:
            n_unmatched += 1
    assert n_matched > 0  # the join is non-vacuous
    # every unmatched probe is explained: its user has no history at all,
    # or the probe precedes the user's first version
    for _, r in out[out["matched"] == 0].iterrows():
        uid, us = int(r["user_id"]), int(r["probe_us"])
        assert uid not in hist or us < hist[uid][0][0]
