"""Every registered query must match its DuckDB oracle at sf0.001 (the
driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import run_all


def test_all_queries_match_oracle(spark):
    results = run_all(SF_SMALL, spark=spark)
    failures = {n: p for n, p in results.items()
                if any(not x.startswith("(rows-only") for x in p)}
    assert not failures, f"oracle mismatches: {failures}"
