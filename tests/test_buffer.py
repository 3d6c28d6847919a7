"""polygon_buffer (operators/buffer.py) vs pure-Python oracles:
rasterization at r=0 against the numpy PIP kernel, distance disks for
degenerate geometry, antimeridian continuity, holes, cap rejection."""

from __future__ import annotations

import numpy as np
import pytest

from htrc_ingester_spark import data
from htrc_ingester_spark.geo import h3lite as H
from htrc_ingester_spark.geo.geometry import haversine_m, points_in_rings
from htrc_ingester_spark.operators.buffer import polygon_buffer
from htrc_ingester_spark.operators.pip_join import poly_rings

RES = 9


def cell_center(cell):
    x = (cell >> 28) & ((1 << 28) - 1)
    y = cell & ((1 << 28) - 1)
    return (
        -180.0 + (x + 0.5) * 360.0 / H.nx(RES),
        -90.0 + (y + 0.5) * 180.0 / H.ny(RES),
    )


def _cells(spark, polys, radius_m, res=RES):
    out = {}
    for r in polygon_buffer(spark, polys, radius_m, res).collect():
        out.setdefault(r.poly_id, set()).add(r.cell)
    return out


class TestRasterizeR0:
    def test_r0_centers_match_pip_kernel(self, spark):
        polys = [p for p in data.polygons() if p["kind"] in ("simple", "concave")]
        got = _cells(spark, polys, 0.0)
        for p in polys:
            cells = got.get(p["poly_id"], set())
            assert cells, p["poly_id"]
            lons = np.array([cell_center(c)[0] for c in cells])
            lats = np.array([cell_center(c)[1] for c in cells])
            inside = points_in_rings(lons, lats, poly_rings(p))
            # every emitted cell center is inside (boundary-distance 0
            # centers are measure-zero in this fixture)
            assert inside.all(), p["poly_id"]

    def test_r0_is_complete_over_bbox_grid(self, spark):
        # brute force: every res-9 cell of the bbox whose center is
        # inside must be emitted
        polys = [p for p in data.polygons() if p["kind"] == "concave"]
        got = _cells(spark, polys, 0.0)[polys[0]["poly_id"]]
        ring = poly_rings(polys[0])[0]
        lon_min, lat_min = ring.min(axis=0)
        lon_max, lat_max = ring.max(axis=0)
        nxr, nyr = H.nx(RES), H.ny(RES)
        xs = range(
            int((lon_min + 180) / 360 * nxr) - 1, int((lon_max + 180) / 360 * nxr) + 2
        )
        ys = range(
            int((lat_min + 90) / 180 * nyr) - 1, int((lat_max + 90) / 180 * nyr) + 2
        )
        want = set()
        for x in xs:
            for y in ys:
                lon = -180.0 + (x + 0.5) * 360.0 / nxr
                lat = -90.0 + (y + 0.5) * 180.0 / nyr
                if points_in_rings(np.array([lon]), np.array([lat]), poly_rings(polys[0]))[0]:
                    want.add(RES * (1 << 56) + x * (1 << 28) + y)
        assert got == want


class TestBufferGrowth:
    def test_monotone_in_radius_and_superset_of_raster(self, spark):
        polys = [p for p in data.polygons() if p["kind"] == "simple"][:1]
        r0 = _cells(spark, polys, 0.0)[polys[0]["poly_id"]]
        r1 = _cells(spark, polys, 30_000.0)[polys[0]["poly_id"]]
        r2 = _cells(spark, polys, 80_000.0)[polys[0]["poly_id"]]
        assert r0 < r1 < r2

    def test_degenerate_point_is_distance_disk(self, spark):
        polys = [p for p in data.polygons() if p["poly_id"] == "poly_degen_pt"]
        r = 50_000.0
        got = _cells(spark, polys, r)[polys[0]["poly_id"]]
        px, py = polys[0]["ring"][0]
        for c in got:
            lon, lat = cell_center(c)
            # flat-earth operator distance vs haversine agree to ~0.5%
            # at this scale
            assert haversine_m(py, px, lat, lon) <= r * 1.01
        # and completeness: a clearly-inside cell is present
        cx = int((px + 180) / 360 * H.nx(RES))
        cy = int((py + 90) / 180 * H.ny(RES))
        assert (RES * (1 << 56) + cx * (1 << 28) + cy) in got


class TestAntimeridian:
    def test_cells_on_both_sides_of_seam(self, spark):
        polys = [p for p in data.polygons() if p["kind"] == "antimeridian"]
        got = _cells(spark, polys, 30_000.0)[polys[0]["poly_id"]]
        xs = {(c >> 28) & ((1 << 28) - 1) for c in got}
        nxr = H.nx(RES)
        assert any(x < nxr // 4 for x in xs)      # east of the seam (lon ≈ -180)
        assert any(x > 3 * nxr // 4 for x in xs)  # west of the seam (lon ≈ +180)
        # no wrap artifacts: every x is near the seam, not mid-Pacific-antipode
        assert all(x < nxr // 64 or x > nxr - nxr // 64 - 8 for x in xs)


class TestHolesAndCaps:
    def test_hole_interior_excluded_at_r0_but_buffered(self, spark):
        # res 12 (cell ~0.022 deg): the 0.1-deg hole spans several
        # cells, so a cell center lands strictly inside it
        res = 12
        p = [q for q in data.polygons_holes() if q["poly_id"] == "holey_sf"][0]
        hole = poly_rings(p)[1]
        hx = 0.5 * float(hole[:, 0].min() + hole[:, 0].max())
        hy = 0.5 * float(hole[:, 1].min() + hole[:, 1].max())
        cx = int((hx + 180) / 360 * H.nx(res))
        cy = int((hy + 90) / 180 * H.ny(res))
        hole_cell = res * (1 << 56) + cx * (1 << 28) + cy
        lon_c = -180.0 + (cx + 0.5) * 360.0 / H.nx(res)
        lat_c = -90.0 + (cy + 0.5) * 180.0 / H.ny(res)
        assert not points_in_rings(
            np.array([lon_c]), np.array([lat_c]), poly_rings(p)
        )[0]  # premise: this cell center really is inside the hole
        r0 = _cells(spark, [p], 0.0, res=res)[p["poly_id"]]
        assert hole_cell not in r0
        big = _cells(spark, [p], 50_000.0, res=res)[p["poly_id"]]
        assert hole_cell in big  # hole boundary is within a big buffer

    def test_polar_cap_rejected(self, spark):
        caps = [p for p in data.polygons() if p["kind"] == "polar_cap"]
        with pytest.raises(ValueError, match="polar-cap"):
            polygon_buffer(spark, caps, 1000.0, RES)


class TestBufferFuzz:
    """Hypothesis: random quads + radius vs a brute-force numpy oracle
    replicating the operator's exact flat-earth distance spec."""

    @staticmethod
    def _seg_dist_m(px, py, ax, ay, bx, by):
        k = np.cos(np.radians(py))
        dxab, dyab = (bx - ax) * k, by - ay
        dxap, dyap = (px - ax) * k, py - ay
        len2 = dxab * dxab + dyab * dyab
        t = 0.0 if len2 == 0.0 else min(max((dxap * dxab + dyap * dyab) / len2, 0.0), 1.0)
        cx, cy = ax + t * (bx - ax), ay + t * (by - ay)
        return float(np.hypot((px - cx) * k, py - cy) * float(H.M_PER_DEG_LAT))

    def _brute(self, ring, radius_m, res):
        from htrc_ingester_spark.geo.geometry import points_in_rings

        r_deg = radius_m / float(H.M_PER_DEG_LAT)
        lons = np.array([p[0] for p in ring])
        lats = np.array([p[1] for p in ring])
        lon_exp = r_deg / np.cos(np.radians(min(abs(lats).max() + r_deg, 89.0)))
        nxr, nyr = H.nx(res), H.ny(res)
        x0 = int(np.floor((lons.min() - lon_exp + 180) / 360 * nxr))
        x1 = int(np.floor((lons.max() + lon_exp + 180) / 360 * nxr))
        y0 = max(int(np.floor((lats.min() - r_deg + 90) / 180 * nyr)), 0)
        y1 = min(int(np.floor((lats.max() + r_deg + 90) / 180 * nyr)), nyr - 1)
        rings = [np.array(ring + [ring[0]], dtype=np.float64)]
        edges = list(zip(ring, ring[1:] + [ring[0]]))
        out = set()
        for x in range(x0, x1 + 1):
            for y in range(y0, y1 + 1):
                lon = -180.0 + (x % nxr + 0.5) * 360.0 / nxr
                lat = -90.0 + (y + 0.5) * 180.0 / nyr
                inside = points_in_rings(np.array([lon]), np.array([lat]), rings)[0]
                near = any(
                    self._seg_dist_m(lon, lat, a[0], a[1], b[0], b[1]) <= radius_m
                    for a, b in edges
                )
                if inside or near:
                    out.add(res * (1 << 56) + (x % nxr) * (1 << 28) + y)
        return out

    def test_random_quads_match_bruteforce(self, spark):
        import random

        res = 8
        for seed in range(4):
            rng = random.Random(seed)
            clon, clat = rng.uniform(-150, 150), rng.uniform(-55, 55)
            w, h = rng.uniform(0.3, 1.5), rng.uniform(0.3, 1.5)
            # convex quad (jittered rectangle, consistent winding)
            jit = lambda: rng.uniform(-0.1, 0.1)  # noqa: E731
            ring = [
                (clon - w + jit(), clat - h + jit()),
                (clon + w + jit(), clat - h + jit()),
                (clon + w + jit(), clat + h + jit()),
                (clon - w + jit(), clat + h + jit()),
            ]
            radius = rng.uniform(5_000, 120_000)
            poly = {"poly_id": f"fz{seed}", "ring": [(float(a), float(b)) for a, b in ring]}
            got = _cells(spark, [poly], radius, res=res).get(f"fz{seed}", set())
            want = self._brute(ring, radius, res)
            assert got == want, (seed, len(got), len(want))
