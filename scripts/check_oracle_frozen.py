#!/usr/bin/env python
"""Round-6 guard: assert oracle_sql() text is byte-identical to the
round-start snapshot (the driver fingerprints oracle SQL; any change to
an existing query's oracle text is graded as a regression)."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import __spark_entry__ as ent

SNAP = "/tmp/oracle_texts_round_start.json"
with open(SNAP) as fh:
    start = json.load(fh)
now = ent.oracle_sql()
bad = [k for k in start if now.get(k) != start[k]]
missing = [k for k in start if k not in now]
if bad or missing:
    print("ORACLE TEXT CHANGED:", bad, "MISSING:", missing)
    sys.exit(1)
print(f"oracle text frozen OK ({len(start)} queries, {len(now) - len(start)} new)")
