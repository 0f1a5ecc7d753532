"""Storage-layout operators (layout_q.py) + the hsv_transform fixture vs
independent Python brute force. The dual renderings share the synthesis
SQL, so dialect parity alone can't catch a wrong rule shared by both —
these pins rebuild the geocode, the Morton interleave, both file
layouts, the probe scans, the binpack plan, the quadtree covering, the
union-find region labels, and the HSV hexcone (colorsys) a third way."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from tests.conftest import SF_SMALL
from unmixing_spark.pagegen import CITIES
from unmixing_spark.queries import registry
from unmixing_spark.queries.layout_q import (
    COVER_LEVELS, FILE_MB_MIN, FILE_MB_SPAN, IX_BITS, IY_BITS, N_FILES,
    TARGET_MB, probe_rects)
from unmixing_spark.spatial.grid import WORLD_GRID


def _urls() -> list[str]:
    df = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    return [f"https://{r.source}.example.com/{r.lang}/{r.doc_id}"
            for r in df.itertuples()]


def _h(url: str, start: int) -> int:
    hx = hashlib.md5(url.encode()).hexdigest()
    return int(hx[start - 1:start + 7], 16)


def _geocode(url: str) -> tuple[float, float]:
    h1, h2, h3 = _h(url, 1), _h(url, 9), _h(url, 17)
    if h1 % 10 < 8:
        lon = CITIES[h1 % 8][0] + ((h2 % 100000) / 1e5 - 0.5) * 2.0
        lat = CITIES[h1 % 8][1] + ((h3 % 100000) / 1e5 - 0.5) * 2.0
    else:
        lon = (h2 % 3600000) / 1e4 - 180.0
        lat = (h3 % 1700000) / 1e4 - 85.0
    return lon, lat


def _cells(url: str) -> tuple[int, int]:
    g = WORLD_GRID
    lon, lat = _geocode(url)
    ix = min(max(int(math.floor((lon + 180.0) / g.deg)), 0), g.nx - 1)
    iy = min(max(int(math.floor((90.0 - lat) / g.deg)), 0), g.ny - 1)
    return ix, iy


def _morton(ix: int, iy: int) -> int:
    m = 0
    for k in range(IX_BITS):
        m |= ((ix >> k) & 1) << (2 * k)
    for k in range(IY_BITS):
        m |= ((iy >> k) & 1) << (2 * k + 1)
    return m


def _ntile(n_rows: int, n_tiles: int, pos: int) -> int:
    """SQL ntile: first (n % t) tiles get ceil(n/t) rows (1-indexed)."""
    big, rem = divmod(n_rows, n_tiles)
    cut = (big + 1) * rem
    if pos < cut:
        return pos // (big + 1) + 1
    return rem + (pos - cut) // big + 1


def test_zorder_layout_matches_brute_force(spark):
    out = registry()["q_zorder_layout"].spark_fn(spark, SF_SMALL).toPandas()
    pts = [(url, *_cells(url)) for url in _urls()]
    pts = [(url, ix, iy, _morton(ix, iy)) for url, ix, iy in pts]
    n = len(pts)

    layouts = {}
    zorder = sorted(pts, key=lambda r: (r[3], r[0]))
    ingest = sorted(pts, key=lambda r: r[0])
    for name, order in (("zorder", zorder), ("ingest", ingest)):
        files: dict[int, list[tuple[int, int]]] = {}
        for pos, (_u, ix, iy, _m) in enumerate(order):
            files.setdefault(_ntile(n, N_FILES, pos), []).append((ix, iy))
        layouts[name] = {
            f: (len(v), min(x for x, _ in v), max(x for x, _ in v),
                min(y for _, y in v), max(y for _, y in v))
            for f, v in files.items()}

    expect = []
    for pid, ix_lo, ix_hi, iy_lo, iy_hi in probe_rects():
        matched = sum(1 for _u, ix, iy, _m in pts
                      if ix_lo <= ix <= ix_hi and iy_lo <= iy <= iy_hi)
        for layout in ("ingest", "zorder"):
            touched = [v for v in layouts[layout].values()
                       if v[1] <= ix_hi and v[2] >= ix_lo
                       and v[3] <= iy_hi and v[4] >= iy_lo]
            rows_scanned = sum(v[0] for v in touched)
            expect.append((layout, pid, len(touched), rows_scanned, matched,
                           round(rows_scanned / n, 6),
                           round(rows_scanned / matched, 6)))

    got = out.sort_values(["layout", "pid"]).reset_index(drop=True)
    exp = (pd.DataFrame(expect, columns=list(got.columns))
           .sort_values(["layout", "pid"]).reset_index(drop=True))
    for c in got.columns:
        if got[c].dtype.kind == "f":
            # SQL round() is half-away, Python round() half-even; exact
            # 6-decimal ties occur on dyadic ratios (same hazard as the
            # compaction fills)
            assert (got[c] - exp[c]).abs().max() <= 1.1e-6, c
        else:
            assert list(got[c]) == list(exp[c]), c

    # the layout claim itself: Z-order scans no more than ingest order on
    # every probe, and strictly fewer files on most (hotspots cluster)
    piv = got.pivot(index="pid", columns="layout", values="files_scanned")
    assert (piv["zorder"] <= piv["ingest"]).all()
    assert (piv["zorder"] < piv["ingest"]).sum() >= 6


def test_compaction_plan_matches_brute_force(spark):
    out = registry()["q_compaction_plan"].spark_fn(spark, SF_SMALL).toPandas()
    df = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    listing: dict[str, list[tuple[str, int]]] = {}
    for r in df.itertuples():
        url = f"https://{r.source}.example.com/{r.lang}/{r.doc_id}"
        mb = FILE_MB_MIN + _h("fsz" + url, 1) % FILE_MB_SPAN
        listing.setdefault(r.source, []).append((url, mb))

    expect = []
    for part in sorted(listing):
        groups: dict[int, tuple[int, int]] = {}
        cum = 0
        for _url, mb in sorted(listing[part]):
            g = cum // TARGET_MB
            nf, b = groups.get(g, (0, 0))
            groups[g] = (nf + 1, b + mb)
            cum += mb
        files_before = sum(nf for nf, _ in groups.values())
        for g in sorted(groups):
            nf, b = groups[g]
            expect.append((part, g, nf, b, round(b / TARGET_MB, 6),
                           files_before, len(groups)))
        # plan sanity: dense group ids, byte conservation, real compaction
        assert sorted(groups) == list(range(len(groups)))
        assert sum(b for _, b in groups.values()) == cum
        assert len(groups) < files_before

    got = out.sort_values(["part_key", "out_group"]).reset_index(drop=True)
    exp = (pd.DataFrame(expect, columns=list(got.columns))
           .sort_values(["part_key", "out_group"]).reset_index(drop=True))
    for c in got.columns:
        if got[c].dtype.kind == "f":
            # SQL round() is half-away, Python round() half-even; group_mb
            # is /512 (dyadic) so exact 6-decimal ties DO occur
            assert (got[c] - exp[c]).abs().max() <= 1.1e-6, c
        else:
            assert list(got[c]) == list(exp[c]), c


def _cover(rect: tuple[int, int, int, int]) -> set[tuple[int, int, int]]:
    """Independent recursive quadtree covering: (level, cx, cy) cells."""
    ix_lo, ix_hi, iy_lo, iy_hi = rect

    def rec(level: int, cx: int, cy: int) -> set[tuple[int, int, int]]:
        w = 1 << level
        x0, x1 = cx * w, (cx + 1) * w - 1
        y0, y1 = cy * w, (cy + 1) * w - 1
        if x0 > ix_hi or x1 < ix_lo or y0 > iy_hi or y1 < iy_lo:
            return set()
        if x0 >= ix_lo and x1 <= ix_hi and y0 >= iy_lo and y1 <= iy_hi:
            return {(level, cx, cy)}
        if level == 0:
            return {(0, cx, cy)}
        out: set[tuple[int, int, int]] = set()
        for dx in (0, 1):
            for dy in (0, 1):
                out |= rec(level - 1, cx * 2 + dx, cy * 2 + dy)
        return out

    w = 1 << COVER_LEVELS
    cells: set[tuple[int, int, int]] = set()
    for cx in range(ix_lo // w, ix_hi // w + 1):
        for cy in range(iy_lo // w, iy_hi // w + 1):
            cells |= rec(COVER_LEVELS, cx, cy)
    return cells


def test_mask_regions_matches_union_find(spark):
    from unmixing_spark.queries.layout_q import REGION_FACTOR
    from unmixing_spark.spatial.grid import WORLD_GRID

    out = registry()["q_mask_regions"].spark_fn(spark, SF_SMALL).toPandas()
    assert (out["converged"] == 1).all()

    pnx = WORLD_GRID.nx // REGION_FACTOR
    occ: dict[tuple[int, int], int] = {}
    for url in _urls():
        ix, iy = _cells(url)
        key = (ix // REGION_FACTOR, iy // REGION_FACTOR)
        occ[key] = occ.get(key, 0) + 1

    parent = {k: k for k in occ}

    def find(k):
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    for (px, py) in occ:
        for nb in ((px + 1, py), (px, py + 1)):
            if nb in occ:
                ra, rb = find((px, py)), find(nb)
                if ra != rb:
                    parent[rb] = ra

    regions: dict[int, list[tuple[int, int, int]]] = {}
    for (px, py), n in occ.items():
        root = find((px, py))
        rid = min(y * pnx + x for (x, y) in occ
                  if find((x, y)) == root)
        regions.setdefault(rid, []).append((px, py, n))

    got = {int(r.region): (int(r.n_cells), int(r.total_pages),
                           int(r.px_min), int(r.px_max),
                           int(r.py_min), int(r.py_max))
           for r in out.itertuples()}
    exp = {rid: (len(v), sum(n for _, _, n in v),
                 min(x for x, _, _ in v), max(x for x, _, _ in v),
                 min(y for _, y, _ in v), max(y for _, y, _ in v))
           for rid, v in regions.items()}
    assert got == exp
    # the labeling must actually merge: the 8 hotspot blobs are solid
    # multi-cell regions, and singletons exist (uniform background)
    multi = [v for v in exp.values() if v[0] > 1]
    assert len(multi) >= 8
    assert any(v[0] == 1 for v in exp.values())


def test_cell_covering_matches_brute_force(spark):
    out = registry()["q_cell_covering"].spark_fn(spark, SF_SMALL).toPandas()
    assert (out["area_ok"] == 1).all()     # in-query proofs actually held
    assert (out["count_ok"] == 1).all()
    saw_mixed = False
    for pid, ix_lo, ix_hi, iy_lo, iy_hi in probe_rects():
        sub = out[out["pid"] == pid]
        exp = _cover((ix_lo, ix_hi, iy_lo, iy_hi))
        got = {(int(r.level), int(r.cx), int(r.cy)) for r in sub.itertuples()}
        assert got == exp, pid
        assert int(sub["n_cells"].iloc[0]) == len(exp)
        # exact disjoint area, re-proven outside the query
        assert sum(4 ** lv for lv, _, _ in exp) == \
            (ix_hi - ix_lo + 1) * (iy_hi - iy_lo + 1)
        # ground-truth page count vs the covering's count column
        matched = sum(1 for url in _urls()
                      if ix_lo <= _cells(url)[0] <= ix_hi
                      and iy_lo <= _cells(url)[1] <= iy_hi)
        assert int(sub["direct_pages"].iloc[0]) == matched
        saw_mixed |= len({lv for lv, _, _ in exp}) >= 3
    # the covering must actually be MIXED-level (else the op degenerates
    # to a flat cell enumeration and proves nothing about the hierarchy)
    assert saw_mixed


def test_hsv_transform_matches_colorsys(spark):
    import colorsys

    cells = registry()["q_cell_raster"].spark_fn(spark, SF_SMALL).toPandas()
    out = (registry()["q_hsv_transform"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("cell_id"))
    m2, m4, m5 = cells["b2"].max(), cells["b4"].max(), cells["b5"].max()
    assert len(out) == len(cells)
    worst = 0.0
    for row in cells.itertuples():
        h, s, v = colorsys.rgb_to_hsv(row.b2 / m2, row.b4 / m4, row.b5 / m5)
        got = out.loc[row.cell_id]
        worst = max(worst, abs(got["h"] - h), abs(got["s"] - s),
                    abs(got["v"] - v))
    # SQL rounds to 6; colorsys is unrounded — exact to rounding
    assert worst <= 5.1e-7
    # the composite must actually produce colorful pixels, not grayscale
    assert (out["s"] > 0.1).mean() > 0.5


def test_tile_pyramid_matches_brute_force(spark):
    from unmixing_spark.queries.raster_q import PYRAMID_LEVELS

    cells = registry()["q_cell_raster"].spark_fn(spark, SF_SMALL).toPandas()
    out = registry()["q_tile_pyramid"].spark_fn(spark, SF_SMALL).toPandas()
    assert (out["conservation"] == 1).all()

    nx = WORLD_GRID.nx
    lvl = {}
    for r in cells.itertuples():
        px, py = int(r.cell_id) % nx, int(r.cell_id) // nx
        lvl[(px, py)] = (int(r.b1), round(r.b2 * 1e6) * int(r.b1),
                         round(r.b4 * 1e6) * int(r.b1),
                         round(r.b5 * 1e6) * int(r.b1), int(r.b6))
    expect = {}
    for level in range(PYRAMID_LEVELS):
        for (px, py), v in lvl.items():
            expect[(level, px, py)] = v
        nxt: dict[tuple[int, int], tuple] = {}
        for (px, py), (b1, s2, s4, s5, b6) in lvl.items():
            k = (px // 2, py // 2)
            o = nxt.get(k, (0, 0, 0, 0, 0))
            nxt[k] = (o[0] + b1, o[1] + s2, o[2] + s4, o[3] + s5,
                      max(o[4], b6))
        lvl = nxt

    assert len(out) == len(expect)
    for r in out.itertuples():
        b1, s2, s4, s5, b6 = expect[(int(r.level), int(r.px), int(r.py))]
        assert int(r.pages) == b1
        assert int(r.latest_doy) == b6
        assert abs(r.mean_text_len - s2 / (b1 * 1e6)) <= 5.1e-7
        assert abs(r.mean_tokens - s4 / (b1 * 1e6)) <= 5.1e-7
        assert abs(r.mean_url_len - s5 / (b1 * 1e6)) <= 5.1e-7
    # real downsampling: strictly fewer cells per level somewhere, and a
    # level-3 cell must merge >= 2 level-0 cells' pages
    n_per = out.groupby("level").size()
    assert n_per.loc[3] < n_per.loc[0]
    l3 = out[out.level == 3]
    l0 = out[out.level == 0]
    assert l3["pages"].max() > l0["pages"].max()
