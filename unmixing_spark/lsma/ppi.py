"""Pixel Purity Index (Boardman 1993) — distributed partial+final.

The reference wraps pysptools.eea.PPI (lsma.py:118-119): project all pixels
onto k random unit "skewers"; pixels that are the extreme (min or max) of
any projection get a purity hit; top-count pixels are endmember candidates.

Distributed shape (SURVEY.md §2.8 L2): the (p x k) skewer matrix is a
seeded broadcast constant; each Arrow batch computes its own per-skewer
extremes (a (2k)-row partial) — the final reduce picks global extremes per
skewer, then counts hits per pixel. Shuffle volume is O(batches * k),
independent of pixel count.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skewers(p: int, n_skewers: int, seed: int = 42) -> np.ndarray:
    """Seeded random unit projection directions, (p, k)."""
    rng = np.random.default_rng(seed)
    S = rng.standard_normal((p, n_skewers))
    return S / np.linalg.norm(S, axis=0)


def ppi_local(X: np.ndarray, n_skewers: int = 10000, seed: int = 42) -> np.ndarray:
    """Single-node kernel: hit counts per pixel, X (N, p)."""
    S = skewers(X.shape[1], n_skewers, seed)
    proj = X @ S
    counts = np.zeros(len(X), dtype=np.int64)
    np.add.at(counts, proj.argmax(axis=0), 1)
    np.add.at(counts, proj.argmin(axis=0), 1)
    return counts


def ppi_distributed(cells: DataFrame, band_cols: list[str],
                    id_col: str = "cell_id", n_skewers: int = 1000,
                    seed: int = 42, top: int = 20) -> DataFrame:
    """→ DataFrame (cell_id, hits) of the ``top`` purest pixels.

    Per-batch partial extremes → groupBy(skewer) global extreme → hit
    count per pixel. Deterministic under repartitioning: global extremes
    use (value, id) lexicographic tie-break."""
    p = len(band_cols)
    S = skewers(p, n_skewers, seed)

    def _partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = pdf[band_cols].to_numpy(dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            proj = X @ S                     # (N, k)
            imax = proj.argmax(axis=0)
            imin = proj.argmin(axis=0)
            k = S.shape[1]
            yield pd.DataFrame({
                "skewer": np.concatenate([np.arange(k), np.arange(k)]),
                "side": np.concatenate([np.ones(k, dtype=np.int32),
                                        -np.ones(k, dtype=np.int32)]),
                "val": np.concatenate([proj[imax, np.arange(k)],
                                       proj[imin, np.arange(k)]]),
                "id": np.concatenate([ids[imax], ids[imin]]),
            })

    partials = cells.mapInPandas(_partial, "skewer int, side int, val double, id long")
    # global extreme per (skewer, side): max side uses max(val), min side min(val);
    # ties broken by smallest id for determinism
    from pyspark.sql import Window
    w = Window.partitionBy("skewer", "side").orderBy(
        F.when(F.col("side") == 1, F.col("val") * -1).otherwise(F.col("val")),
        F.col("id"))
    winners = (partials.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1))
    return (winners.groupBy(F.col("id").alias(id_col))
            .agg(F.count("*").alias("hits"))
            .orderBy(F.desc("hits"), id_col)
            .limit(top))
