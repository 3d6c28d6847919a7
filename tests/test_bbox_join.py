"""bbox_intersect_join vs a numpy brute-force oracle + dedup-free plan
checks."""

import numpy as np
import pandas as pd
import pytest

from htrc_ingester_spark.operators.bbox_join import auto_res, bbox_intersect_join


def _boxes_pdf(n, seed, idp=""):
    rng = np.random.default_rng(seed)
    # cluster 70% of boxes so intersections are plentiful; sizes vary
    # over two orders of magnitude to stress auto_res
    cx = np.where(rng.random(n) < 0.7, rng.normal(10.0, 2.0, n), rng.uniform(-179, 179, n))
    cy = np.where(rng.random(n) < 0.7, rng.normal(45.0, 2.0, n), rng.uniform(-89, 89, n))
    w = rng.uniform(0.05, 5.0, n)
    h = rng.uniform(0.05, 3.0, n)
    return pd.DataFrame(
        {
            "id": [f"{idp}{i}" for i in range(n)],
            "lon_min": np.maximum(cx - w, -180.0),
            "lat_min": np.maximum(cy - h, -90.0),
            "lon_max": np.minimum(cx + w, 180.0),
            "lat_max": np.minimum(cy + h, 90.0),
        }
    )


def _brute(a, b):
    out = set()
    for ra in a.itertuples(index=False):
        for rb in b.itertuples(index=False):
            if (
                ra.lon_min <= rb.lon_max
                and rb.lon_min <= ra.lon_max
                and ra.lat_min <= rb.lat_max
                and rb.lat_min <= ra.lat_max
            ):
                out.add((ra.id, rb.id))
    return out


class TestBBoxJoin:
    def test_matches_bruteforce_auto_and_explicit_res(self, spark):
        a_pdf, b_pdf = _boxes_pdf(220, 1, "a"), _boxes_pdf(180, 2, "b")
        a, b = spark.createDataFrame(a_pdf), spark.createDataFrame(b_pdf)
        want = _brute(a_pdf, b_pdf)
        got_auto = bbox_intersect_join(spark, a, b).select("a_id", "b_id").collect()
        pairs_auto = {(r["a_id"], r["b_id"]) for r in got_auto}
        assert len(got_auto) == len(pairs_auto), "duplicate pairs emitted"
        assert pairs_auto == want
        # explicit res (coarser AND finer than auto) — identical output
        r = auto_res(a, b)
        for rr in [max(r - 2, 0), r + 2]:
            got = bbox_intersect_join(spark, a, b, res=rr).select("a_id", "b_id").collect()
            assert {(x["a_id"], x["b_id"]) for x in got} == want, rr
            assert len(got) == len(want), rr

    def test_shared_edge_and_corner_count_once(self, spark):
        a = spark.createDataFrame(
            pd.DataFrame(
                {"id": ["a0"], "lon_min": [0.0], "lat_min": [0.0], "lon_max": [10.0], "lat_max": [10.0]}
            )
        )
        b = spark.createDataFrame(
            pd.DataFrame(
                {
                    "id": ["edge", "corner", "inside", "miss"],
                    "lon_min": [10.0, 10.0, 2.0, 10.001],
                    "lat_min": [0.0, 10.0, 2.0, 0.0],
                    "lon_max": [20.0, 20.0, 3.0, 20.0],
                    "lat_max": [10.0, 20.0, 3.0, 10.0],
                }
            )
        )
        rows = bbox_intersect_join(spark, a, b, res=5).select("b_id").collect()
        got = sorted(r["b_id"] for r in rows)
        assert got == ["corner", "edge", "inside"]

    def test_plan_no_distinct_no_window(self, spark):
        a = spark.createDataFrame(_boxes_pdf(50, 3, "a"))
        b = spark.createDataFrame(_boxes_pdf(50, 4, "b"))
        plan = (
            bbox_intersect_join(spark, a, b, res=6)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Deduplicate" not in plan and "Window" not in plan
        # the only aggregate anywhere would be a distinct — there is none
        assert "HashAggregate" not in plan and "SortAggregate" not in plan

    def test_degenerate_point_boxes(self, spark):
        # zero-area boxes behave as points; containment still matches
        a = spark.createDataFrame(
            pd.DataFrame(
                {"id": ["p"], "lon_min": [5.0], "lat_min": [5.0], "lon_max": [5.0], "lat_max": [5.0]}
            )
        )
        b = spark.createDataFrame(
            pd.DataFrame(
                {
                    "id": ["holds", "not"],
                    "lon_min": [0.0, 6.0],
                    "lat_min": [0.0, 6.0],
                    "lon_max": [10.0, 7.0],
                    "lat_max": [10.0, 7.0],
                }
            )
        )
        rows = bbox_intersect_join(spark, a, b, res=4).select("b_id").collect()
        assert [r["b_id"] for r in rows] == ["holds"]
