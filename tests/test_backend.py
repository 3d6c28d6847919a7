"""geo/backend.py: the pluggable cell-index backend. The h3lite paths
run hermetically; the real-H3 paths are import-guarded (skipped where
the wheel is absent) and assert BEHAVIORAL equality — pip_join results
are exact under any backend because classification is conservative and
the refine is the same ray-cast."""

from __future__ import annotations

import numpy as np
import pytest

from htrc_ingester_spark import data
from htrc_ingester_spark.geo import h3lite as H
from htrc_ingester_spark.geo.backend import HAS_H3, H3LiteBackend, get_backend
from htrc_ingester_spark.operators.pip_join import build_cell_cover, pip_join

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


class TestH3LiteBackend:
    def test_children_pair_with_parents(self):
        be = H3LiteBackend()
        cells = H.latlng_to_cell(np.array([10.0, -40.0]), np.array([20.0, 170.0]), 5)
        kids, parent = be.cells_to_children(cells)
        assert len(kids) == 8 and list(np.unique(parent)) == [0, 1]
        # every child's parent must round-trip
        back = H.cell_to_parent(kids, 5)
        assert np.array_equal(back, cells[parent])

    def test_corners_shape_and_bbox(self):
        be = H3LiteBackend()
        cells = np.atleast_1d(H.latlng_to_cell(37.77, -122.42, 7))
        lons, lats = be.cell_corners(cells)
        assert lons.shape == (1, 4)
        lon0, lat0, lon1, lat1 = H.cell_to_boundary(cells)
        assert lons.min() == lon0[0] and lons.max() == lon1[0]
        assert lats.min() == lat0[0] and lats.max() == lat1[0]

    def test_num_cells_and_selection(self):
        assert H3LiteBackend().num_cells(3) == H.nx(3) * H.ny(3)
        assert get_backend().name == "h3lite"
        assert get_backend("h3lite").aperture == 4
        with pytest.raises(ValueError):
            get_backend("nope")

    def test_default_cover_identical_to_explicit_backend(self):
        a = build_cell_cover(data.polygons_holes(), 7)
        b = build_cell_cover(data.polygons_holes(), 7, backend=H3LiteBackend())
        assert a.equals(b)


@pytest.mark.skipif(not HAS_H3, reason="h3 wheel not installed in this container")
class TestRealH3Backend:  # pragma: no cover - exercised only with the wheel
    def test_encode_parent_disk_roundtrip(self):
        be = get_backend("h3")
        c = int(be.latlng_to_cell(37.77, -122.42, 9))
        p = int(be.cell_to_parent(c, 7))
        import h3

        assert h3.get_resolution(h3.int_to_str(c)) == 9
        assert h3.get_resolution(h3.int_to_str(p)) == 7
        disk = be.grid_disk(c, 1)
        assert c in set(int(x) for x in disk) and len(disk) in (6, 7)

    def test_pip_join_results_backend_invariant(self, spark):
        """Same exact hit set under h3lite and real-H3 indexing: the
        cover/probe only generates candidates; the ray-cast refine and
        the full-cell proof decide membership identically."""
        pdf = data.images_meta_pdf(300)
        pts = spark.createDataFrame(pdf[["image_id", "lon", "lat"]])
        a = (
            pip_join(spark, pts, data.polygons_holes(), res=5)
            .select("image_id", "poly_id").toPandas()
            .sort_values(["image_id", "poly_id"]).reset_index(drop=True)
        )
        b = (
            pip_join(spark, pts, data.polygons_holes(), res=5, backend="h3")
            .select("image_id", "poly_id").toPandas()
            .sort_values(["image_id", "poly_id"]).reset_index(drop=True)
        )
        assert a.equals(b)
