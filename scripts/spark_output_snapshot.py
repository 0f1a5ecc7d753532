#!/usr/bin/env python
"""Round-6 parity guard: snapshot/compare the EXACT Spark output of every
registered query. The optimization rule is bit-identical results — the
driver hashes values — so the strongest local check is Spark-before vs
Spark-after equality, not the float-tolerant oracle harness.

  python scripts/spark_output_snapshot.py SF_DIR SNAP_DIR save [q1,q2,...]
  python scripts/spark_output_snapshot.py SF_DIR SNAP_DIR check [q1,q2,...]
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(repr)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir, snap_dir, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    only = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    os.makedirs(snap_dir, exist_ok=True)

    import __spark_entry__ as ent
    from unmixing_spark.session import get_spark

    spark = get_spark(app_name="snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    bad: list[str] = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        path = os.path.join(snap_dir, f"{name}.pkl")
        try:
            out = canon(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            bad.append(name)
            continue
        if mode == "save":
            with open(path, "wb") as fh:
                pickle.dump(out, fh)
            print(f"SAVE {name} ({len(out)} rows)")
        else:
            with open(path, "rb") as fh:
                ref = pickle.load(fh)
            try:
                pd.testing.assert_frame_equal(out, ref, check_exact=True)
                print(f"OK   {name}")
            except AssertionError as e:
                print(f"DIFF {name}: {str(e)[:400]}")
                bad.append(name)
    if bad:
        print("FAILED:", bad)
        sys.exit(1)
    print("all identical" if mode == "check" else "snapshot complete")


if __name__ == "__main__":
    main()
