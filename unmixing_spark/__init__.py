"""unmixing_spark — a PySpark-native spatial tiling + spectral mixture
analysis engine.

A from-scratch re-expression of the capabilities of ``arthur-e/unmixing``
(reference at /root/reference, v0.2.4.dev) as an idiomatic Spark DataFrame
engine over web-scale page tables:

- pages (url, warc_ts, html, text, lang) are geocoded and cell-encoded on a
  deterministic affine grid (the reference's ``xy_to_pixel`` truncation
  semantics, utils.py:1104-1157, generalized to a world grid),
- cells are rasterized into multiband tiles,
- tiles are transformed (Tasseled Cap / NDVI / BCI / RNDSI / MNF) and
  unmixed with FCLS (Heinz & Chang 2001) as batched per-partition linear
  algebra in Arrow-vectorized pandas UDFs — never per-row Python.

Everything is DataFrame-first: Catalyst does pruning/pushdown/AQE; the only
Python that runs per-batch is NumPy linear algebra behind Arrow.
"""

__version__ = "0.1.0"

from unmixing_spark.session import get_spark  # noqa: F401
