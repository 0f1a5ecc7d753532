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
