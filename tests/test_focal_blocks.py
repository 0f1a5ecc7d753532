"""Round-6 block-grouped SASMA fan-out (sasma/focal.py): the
_block_dest_expr shipping set must cover exactly the blocks whose
super-region contains the tile — i.e. every block that holds a valid
tile within Chebyshev ``rings`` of it receives a copy (the condition
the per-tile interior convolutions need), and nothing outside the
block grid is ever addressed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from unmixing_spark.sasma.focal import BLOCK_T, _block_dest_expr
from unmixing_spark.spatial.grid import WORLD_GRID as g


@pytest.mark.parametrize("rings", [1, 2])
def test_block_dest_covers_needed_blocks(spark, rings):
    B = BLOCK_T
    ntx = g.ntx
    nty = (g.ny + g.tile - 1) // g.tile
    nbx = (ntx + B - 1) // B
    nby = (nty + B - 1) // B
    # interior, edge and corner tiles plus the last row/col
    probe = [0, 1, ntx - 1, ntx, 5 * ntx + 7,
             (nty - 1) * ntx, nty * ntx - 1]
    df = spark.createDataFrame([(int(t),) for t in probe], "tile_id long")
    got = {r["tile_id"]: set(r["dests"]) for r in
           df.select("tile_id",
                     _block_dest_expr(g, rings, B).alias("dests"))
           .collect()}
    for t in probe:
        ty, tx = divmod(t, ntx)
        # required: blocks owning any VALID tile within `rings` of t
        need = set()
        for dy in range(-rings, rings + 1):
            for dx in range(-rings, rings + 1):
                y, x = ty + dy, tx + dx
                if 0 <= y < nty and 0 <= x < ntx:
                    need.add((y // B) * nbx + (x // B))
        assert need <= got[t], (t, need - got[t])
        # never addresses a block outside the block grid
        assert all(0 <= b < nbx * nby for b in got[t])
        # and never more than the blocks of the ring-neighbourhood
        # positions (clipped floor) — the documented <= bound
        bound = set()
        for dy in range(-rings, rings + 1):
            for dx in range(-rings, rings + 1):
                by, bx = (ty + dy) // B, (tx + dx) // B
                if 0 <= by < nby and 0 <= bx < nbx:
                    bound.add(by * nbx + bx)
        assert got[t] <= bound, (t, got[t] - bound)


def test_block_supertile_offsets_consistent():
    """The _conv offset arithmetic: a tile shipped to a block lands at
    a super-tile slot iff it is inside the (B + 2*rings)^2 region —
    recheck the Python-side bookkeeping against the shipping set for a
    block in the middle of the grid."""
    B, rings = BLOCK_T, 1
    ntx = g.ntx
    nbx = (ntx + B - 1) // B
    S = B + 2 * rings
    dest = 7 * nbx + 9           # block (7, 9)
    dby, dbx = divmod(dest, nbx)
    ty0, tx0 = dby * B - rings, dbx * B - rings
    inside = []
    for ty in range(ty0, ty0 + S):
        for tx in range(tx0, tx0 + S):
            oy, ox = ty - ty0, tx - tx0
            assert 0 <= oy < S and 0 <= ox < S
            inside.append((ty, tx))
    # exactly the (B+2r)^2 super-region, each with a unique slot
    assert len(set(inside)) == S * S
    # every center tile of the block is strictly interior to the
    # super-region by `rings` cells-worth of tiles
    for i in range(B):
        for j in range(B):
            oy, ox = (dby * B + i) - ty0, (dbx * B + j) - tx0
            assert rings <= oy < S - rings and rings <= ox < S - rings
