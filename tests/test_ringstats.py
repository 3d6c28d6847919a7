"""ring_metrics: known-value measures, orientation sign, auto-close,
degenerate handling, and the zero-exchange plan claim."""

from __future__ import annotations

import math

from htrc_ingester_spark.operators.ringstats import ring_metrics

_SCHEMA = "poly_id string, vertices array<struct<lon: double, lat: double>>"


def _one(spark, verts):
    df = spark.createDataFrame([("p", verts)], _SCHEMA)
    return ring_metrics(df).collect()[0]


class TestRingMetrics:
    def test_unit_square_ccw(self, spark):
        r = _one(spark, [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)])
        assert r.signed_area == 4.0 and r.area == 4.0
        assert r.perimeter == 8.0
        assert (r.centroid_lon, r.centroid_lat) == (1.0, 1.0)

    def test_cw_flips_sign_only(self, spark):
        r = _one(spark, [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)])
        assert r.signed_area == -4.0 and r.area == 4.0
        assert (r.centroid_lon, r.centroid_lat) == (1.0, 1.0)

    def test_open_ring_auto_closed(self, spark):
        r = _one(spark, [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)])
        assert r.area == 4.0 and r.perimeter == 8.0

    def test_triangle_centroid(self, spark):
        r = _one(spark, [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (0.0, 0.0)])
        assert r.area == 4.5
        assert math.isclose(r.centroid_lon, 1.0) and math.isclose(r.centroid_lat, 1.0)
        assert math.isclose(r.perimeter, 6.0 + 3.0 * math.sqrt(2.0))

    def test_degenerate_zero_area_null_centroid(self, spark):
        r = _one(spark, [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (1.0, 1.0)])
        assert r.area == 0.0 and r.centroid_lon is None and r.centroid_lat is None

    def test_zero_exchange_plan(self, spark):
        """The whole point of the HOF formulation: measuring rings is a
        map-only scan — no Exchange in the optimized plan."""
        df = spark.createDataFrame(
            [("p", [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)])], _SCHEMA
        )
        plan = ring_metrics(df)._jdf.queryExecution().optimizedPlan().toString()
        assert "Exchange" not in plan and "exchange" not in plan
