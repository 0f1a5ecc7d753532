"""Smoke tests of the driver contract: entry(), queries(), oracle parity."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def test_entry_runs(spark):
    import __spark_entry__ as ent
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"tile_id", "q", "m", "n", "abundances", "n_pixels", "mean_rmse"} <= cols


def test_entry_abundances_sum_to_one(spark):
    import __spark_entry__ as ent
    rows = ent.entry(spark).limit(5).collect()
    for row in rows:
        a = np.asarray(row["abundances"], dtype=np.float64).reshape(
            row["q"], len(row["idx"]))
        valid = a[0] != -9999.0
        if valid.any():
            sums = a[:, valid].sum(axis=0)
            assert np.abs(sums - 1.0).max() < 1e-3


def test_queries_have_oracles():
    import __spark_entry__ as ent
    qs, os_ = ent.queries(), ent.oracle_sql()
    assert len(qs) >= 40
    assert set(os_) <= set(qs)
    # >=80% of queries must carry a full SQL oracle
    assert len(os_) >= 0.8 * len(qs)


def test_unmix_cells_matches_local(spark):
    """Distributed unmix == local NumPy on collected spectra (exact)."""
    from unmixing_spark import pipeline
    from unmixing_spark.lsma.fcls import fcls_abundance
    from unmixing_spark.pagegen import BAND_NAMES

    cells = pipeline.cell_raster(spark, SF_SMALL).orderBy("cell_id").limit(200)
    pdf = cells.toPandas()
    dist = (pipeline.unmix_cells(spark.createDataFrame(pdf),
                                 pipeline.CANONICAL_ENDMEMBERS,
                                 band_cols=list(BAND_NAMES))
            .orderBy("cell_id").toPandas())
    local = fcls_abundance(pdf.sort_values("cell_id")[list(BAND_NAMES)].to_numpy(),
                           pipeline.CANONICAL_ENDMEMBERS)
    got = dist[["a1", "a2", "a3"]].to_numpy()
    # raw floats agree to addition-order noise (LAPACK multi-RHS solves
    # vary at the last ulp with batch width); the engine's emitted values
    # are round(6) and must be byte-identical
    assert np.allclose(got, local, rtol=0, atol=1e-9)
    assert np.array_equal(np.round(got, 6), np.round(local, 6))
