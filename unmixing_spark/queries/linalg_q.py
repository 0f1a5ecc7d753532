"""Linear-algebra operator queries: FCLS, endmember induction, renormalize.

FCLS/MNF/PPI are pandas-UDF operators (oracle=None → rows-only driver
check; numeric verification lives in tests/). The endmember combination
searches (max angle/area/volume, lsma.py:367-498) ARE SQL-expressible —
they are cross-joins over a small candidate set with closed-form scores —
so they get full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unmixing_spark import dialect as D
from unmixing_spark import pipeline
from unmixing_spark.pagegen import cell_raster_sql
from unmixing_spark.queries import QuerySpec, register, sql_template


# ---- FCLS (flagship; rows-only, verified in tests/test_fcls.py) -----------

def _fcls_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = pipeline.flagship_abundance_cells(spark, sf_dir)
    return df.select(
        "cell_id",
        *[F.round(F.col(f"a{i+1}"), 6).alias(f"a{i+1}") for i in range(3)],
        F.round("rmse", 4).alias("rmse"),
    )


register("q_fcls_abundance", QuerySpec(
    spark_fn=_fcls_cells, oracle=None,
    doc="FCLS abundance per cell (Heinz & Chang 2001; lsma.py:179-230)"))


def _fcls_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = pipeline.flagship_abundance_tiles(spark, sf_dir)
    return df.select("tile_id", "q", "m", "n", "n_pixels",
                     F.round("mean_rmse", 4).alias("mean_rmse"))


register("q_fcls_tiles", QuerySpec(
    spark_fn=_fcls_tiles, oracle=None,
    doc="tile-grouped FCLS abundance cubes — BASELINE throughput unit"))


# ---- candidate set for combination searches --------------------------------

def _candidates(d: str) -> str:
    """Top-12 cells by page count (deterministic tie-break) with a 3-band
    spectrum — the grouped candidate set of iterate_endmember_combinations
    (lsma.py:587-655)."""
    return f"""
    cand AS (
      SELECT cell_id, b2 AS s1, b4 AS s2, b6 AS s3
      FROM ({cell_raster_sql(d)})
      ORDER BY b1 DESC, b2 DESC, cell_id
      LIMIT 12
    )
    """


def _max_volume(d: str) -> str:
    # lsma.endmembers_by_maximum_volume (lsma.py:461-498): |det| of the
    # (q x q) spectra matrix per 3-combination; argmax. The reference's
    # itertools.combinations cross product (lsma.py:644) as a self-join.
    det = ("a.s1 * (b.s2 * c.s3 - b.s3 * c.s2) "
           "- a.s2 * (b.s1 * c.s3 - b.s3 * c.s1) "
           "+ a.s3 * (b.s1 * c.s2 - b.s2 * c.s1)")
    return f"""
    WITH {_candidates(d)}
    SELECT a.cell_id AS em1, b.cell_id AS em2, c.cell_id AS em3,
           round(abs({det}), 4) AS volume
    FROM cand a JOIN cand b ON a.cell_id < b.cell_id
                JOIN cand c ON b.cell_id < c.cell_id
    ORDER BY abs({det}) DESC, a.cell_id, b.cell_id, c.cell_id
    LIMIT 1
    """


sql_template("q_endmembers_max_volume", _max_volume,
             "endmember combo with max |det| volume (lsma.py:461-498)")


def _max_area(d: str) -> str:
    # lsma.endmembers_by_maximum_area (lsma.py:432-458): triangle area
    # 0.5*|cross(b-a, c-a)| in 2-D feature space per combo; argmax.
    cross = ("(b.s1 - a.s1) * (c.s2 - a.s2) - (b.s2 - a.s2) * (c.s1 - a.s1)")
    return f"""
    WITH {_candidates(d)}
    SELECT a.cell_id AS em1, b.cell_id AS em2, c.cell_id AS em3,
           round({D.dbl(0.5)} * abs({cross}), 4) AS area
    FROM cand a JOIN cand b ON a.cell_id < b.cell_id
                JOIN cand c ON b.cell_id < c.cell_id
    ORDER BY abs({cross}) DESC, a.cell_id, b.cell_id, c.cell_id
    LIMIT 1
    """


sql_template("q_endmembers_max_area", _max_area,
             "endmember combo with max triangle area (lsma.py:432-458)")


def _max_angle(d: str) -> str:
    # lsma.endmembers_by_maximum_angle (lsma.py:367-429): angle at a fixed
    # reference vertex between two candidate unit vectors, acos of the
    # clipped dot product (lsma.py:384-392); argmax over 2-combinations.
    # Reference vertex: the global band means.
    dot = "(a.s1 - r.m1) * (b.s1 - r.m1) + (a.s2 - r.m2) * (b.s2 - r.m2) + (a.s3 - r.m3) * (b.s3 - r.m3)"
    na = "sqrt((a.s1 - r.m1) * (a.s1 - r.m1) + (a.s2 - r.m2) * (a.s2 - r.m2) + (a.s3 - r.m3) * (a.s3 - r.m3))"
    nb = "sqrt((b.s1 - r.m1) * (b.s1 - r.m1) + (b.s2 - r.m2) * (b.s2 - r.m2) + (b.s3 - r.m3) * (b.s3 - r.m3))"
    ang = (f"acos(least(greatest(({dot}) / nullif(({na}) * ({nb}), 0), "
           f"{D.dbl(-1.0)}), {D.dbl(1.0)}))")
    return f"""
    WITH {_candidates(d)},
    r AS (SELECT avg(s1) m1, avg(s2) m2, avg(s3) m3 FROM cand)
    SELECT a.cell_id AS em1, b.cell_id AS em2, round({ang}, 6) AS angle
    FROM cand a JOIN cand b ON a.cell_id < b.cell_id CROSS JOIN r
    ORDER BY {ang} DESC, a.cell_id, b.cell_id
    LIMIT 1
    """


sql_template("q_endmembers_max_angle", _max_angle,
             "endmember pair with max angle at reference vertex (lsma.py:367-429)")


# ---- abundance renormalizations (lsma.py:842-855, 300-330) -----------------

def _subtract_normalize(d: str) -> str:
    # subtract_endmember_and_normalize (lsma.py:842-855): drop one band,
    # renormalize the rest by their sum
    return f"""
    WITH shares AS (
      SELECT cell_id, b1 AS w1, b3 AS w2,
             least(b4 / {D.dbl(50.0)}, {D.dbl(3.0)}) AS w3
      FROM ({cell_raster_sql(d)})
    )
    SELECT cell_id,
           round(w2 / nullif(w2 + w3, 0), 6) AS r1,
           round(w3 / nullif(w2 + w3, 0), 6) AS r2
    FROM shares
    """


sql_template("q_subtract_endmember_normalize", _subtract_normalize,
             "drop endmember + renormalize remainder (lsma.py:842-855)")


def _combine_normalize(d: str) -> str:
    # combine_endmembers_and_normalize (lsma.py:300-330): merge two
    # abundance bands then renormalize
    return f"""
    WITH shares AS (
      SELECT cell_id, b1 AS w1, b3 AS w2,
             least(b4 / {D.dbl(50.0)}, {D.dbl(3.0)}) AS w3
      FROM ({cell_raster_sql(d)})
    )
    SELECT cell_id,
           round((w1 + w2) / nullif(w1 + w2 + w3, 0), 6) AS merged,
           round(w3 / nullif(w1 + w2 + w3, 0), 6)        AS rest
    FROM shares
    """


sql_template("q_combine_endmembers_normalize", _combine_normalize,
             "merge endmember bands + renormalize (lsma.py:300-330)")


# ---- covariance partials (A10: eigen/dimensionality, visualize.py:265-277) --

def _band_covariance(d: str) -> str:
    return f"""
    WITH cells AS ({cell_raster_sql(d)})
    SELECT round(covar_samp(b2, b4), 4) AS c24,
           round(covar_samp(b2, b6), 4) AS c26,
           round(covar_samp(b4, b6), 4) AS c46,
           round(var_samp(b2), 4) AS v2,
           round(var_samp(b4), 4) AS v4,
           round(var_samp(b6), 4) AS v6
    FROM cells
    """


sql_template("q_band_covariance", _band_covariance,
             "band covariance matrix entries — partial-agg stage of the eigendecomposition (visualize.py:265-277)")


# ---- NFINDR (L3, lsma.py:122-123) with a planted-simplex full-value oracle --

# Three synthetic vertices whose (s1, s2) triangle strictly contains every
# data candidate (b2 <= ~600, b4 <= ~100 by construction of pagegen's cell
# raster): with all real candidates strictly interior, the global max-|det|
# simplex over the union is exactly the planted triangle, and the N-FINDR
# positional-swap sweep provably converges to it (each swap maximizes a
# linear functional over the candidate set, which is attained at a convex-
# hull vertex = a planted vertex). That turns the local search into a
# globally-checkable computation: the oracle is the exhaustive argmax.
NFINDR_PLANTED = ((-3, -10000.0, -10000.0),
                  (-2, 50000.0, -10000.0),
                  (-1, -10000.0, 50000.0))
NFINDR_TOPN = 60


def _nfindr_candidates(d: str) -> str:
    planted = " UNION ALL ".join(
        f"SELECT cast({cid} as bigint) AS cell_id, "
        f"{D.dbl(x)} AS s1, {D.dbl(y)} AS s2"
        for cid, x, y in NFINDR_PLANTED)
    return f"""
    cand AS (
      SELECT cell_id, s1, s2 FROM (
        SELECT cell_id, b2 AS s1, b4 AS s2
        FROM ({cell_raster_sql(d)})
        ORDER BY b1 DESC, b2 DESC, cell_id
        LIMIT {NFINDR_TOPN}
      )
      UNION ALL
      {planted}
    )"""


# the planted simplex pins the winning SIMPLEX to a data-independent
# constant (that is what makes the swap search provably exact); the audit
# aggregate re-introduces data dependence so the driver's value hash still
# detects Spark/DuckDB divergence in the candidate pre-filter itself
def _nfindr_audit(over: str = "") -> str:
    """Audit columns; ``over='OVER ()'`` renders the windowed form so the
    Spark path can ride them on the candidate collect (one rendering —
    no string surgery that could silently miss on a reformat)."""
    return (f"cast(count(*) {over} as bigint) AS n_cand, "
            f"round(sum(round(s1, 3)) {over} + sum(round(s2, 3)) {over}, 2) "
            "AS cand_checksum")


def _nfindr_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-FINDR endmember extraction (Winter 1999; reference wraps
    pysptools.eea.NFINDR at lsma.py:122-123) in the distributed-candidate
    shape: the Spark stage is the top-N candidate pre-filter (the same
    pruning PPI survivors give at scale), the collected candidate matrix is
    tiny by construction, and the swap search runs on the driver. The
    planted simplex (see NFINDR_PLANTED) makes the result equal to the
    exhaustive max-|det| oracle; the audit columns (computed by Spark SQL
    over the same cand CTE the oracle aggregates) keep the row
    data-dependent."""
    from unmixing_spark.lsma.endmembers import nfindr
    from unmixing_spark.pipeline import register_tables

    register_tables(spark, sf_dir, ("documents",))
    # single driver action: the audit aggregates ride the same 63-row
    # collect as unpartitioned window columns (SQL-computed, so the
    # rounding semantics stay bit-identical to the DuckDB oracle's)
    cand = spark.sql(f"WITH {_nfindr_candidates(D.SPARK)} "
                     f"SELECT cell_id, s1, s2, {_nfindr_audit('OVER ()')} "
                     f"FROM cand")
    pdf = cand.toPandas().sort_values("cell_id").reset_index(drop=True)
    audit = pdf.iloc[0]
    idx = nfindr(pdf[["s1", "s2"]].to_numpy(), q=3)
    sel = pdf.iloc[idx].sort_values("cell_id")
    (x1, y1), (x2, y2), (x3, y3) = sel[["s1", "s2"]].to_numpy()
    vol = abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1))
    ids = [int(v) for v in sel["cell_id"]]
    return spark.createDataFrame(
        [(ids[0], ids[1], ids[2], float(round(vol, 4)),
          int(audit["n_cand"]), float(audit["cand_checksum"]))],
        "em1 bigint, em2 bigint, em3 bigint, volume double, "
        "n_cand bigint, cand_checksum double")


def _nfindr_oracle(d: str) -> str:
    # exhaustive argmax of the bordered determinant |det [1 1 1; x; y]| —
    # the same volume functional nfindr() maximizes (endmembers.py:207-210)
    det = "(b.s1 - a.s1) * (c.s2 - a.s2) - (c.s1 - a.s1) * (b.s2 - a.s2)"
    return f"""
    WITH {_nfindr_candidates(d)},
    audit AS (SELECT {_nfindr_audit()} FROM cand)
    SELECT em1, em2, em3, volume, n_cand, cand_checksum FROM (
      SELECT a.cell_id AS em1, b.cell_id AS em2, c.cell_id AS em3,
             round(abs({det}), 4) AS volume
      FROM cand a JOIN cand b ON a.cell_id < b.cell_id
                  JOIN cand c ON b.cell_id < c.cell_id
      ORDER BY abs({det}) DESC, a.cell_id, b.cell_id, c.cell_id
      LIMIT 1
    ) w CROSS JOIN audit
    """


register("q_nfindr", QuerySpec(
    spark_fn=_nfindr_spark, oracle=_nfindr_oracle(D.DUCKDB),
    doc="N-FINDR simplex-volume endmember extraction, planted-simplex full oracle (Winter 1999; lsma.py:122-123)"))


# ---- eigen power sums (A10 value oracle via Newton's identities) ------------

def _eigen_power_sums(d: str) -> str:
    """Full-value oracle for the covariance eigendecomposition surface
    (visualize.py:265-277 / q_eigen_spectrum): the eigenvalues of the p=6
    band covariance S are determined by the power sums tr(S^k) = sum(λ^k),
    k=1..6 (Newton's identities), and matrix powers of a 6x6 are plain SQL
    arithmetic over the covar_samp aggregates.

    Bit-parity: the base entries are rounded aggregates (identical doubles
    under both dialects per the q_band_covariance discipline); every later
    op is the same IEEE expression tree in both renderings, so the chain
    stays value-identical. Outputs are t1 (~1e4, round 4) and the
    scale-free ratios r_k = tr(S^k)/tr(S)^k (≤ 1, round 9) so no rounding
    happens at 1e25 magnitudes. pytest ties r_k to np.linalg.eigvalsh."""
    from unmixing_spark.pagegen import BAND_NAMES
    p = len(BAND_NAMES)

    def m(k: int, i: int, j: int) -> str:
        i, j = min(i, j), max(i, j)
        return f"m{k}_{i}_{j}"

    cov_cols = ", ".join(
        f"round(covar_samp({BAND_NAMES[i]}, {BAND_NAMES[j]}), 4) AS {m(1, i, j)}"
        for i in range(p) for j in range(i, p))
    ctes = [f"p1 AS (SELECT {cov_cols} FROM ({cell_raster_sql(d)}))"]
    for k in range(2, p + 1):
        carry = [m(lv, i, j) for lv in range(1, k)
                 for i in range(p) for j in range(i, p)]
        new = []
        for i in range(p):
            for j in range(i, p):
                terms = " + ".join(f"{m(k - 1, i, l)} * {m(1, l, j)}"
                                   for l in range(p))
                new.append(f"({terms}) AS {m(k, i, j)}")
        ctes.append(f"p{k} AS (SELECT {', '.join(carry + new)} FROM p{k - 1})")
    t1 = "(" + " + ".join(m(1, i, i) for i in range(p)) + ")"
    outs = [f"round({t1}, 4) AS t1"]
    for k in range(2, p + 1):
        tk = "(" + " + ".join(m(k, i, i) for i in range(p)) + ")"
        denom = " * ".join([t1] * k)
        outs.append(f"round({tk} / ({denom}), 9) AS r{k}")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT {', '.join(outs)} FROM p{p}")


sql_template("q_eigen_power_sums", _eigen_power_sums,
             "covariance eigen spectrum as power sums tr(S^k)=sum(lambda^k) — Newton-identities value oracle for A10 (visualize.py:265-277)")
