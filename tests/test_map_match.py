"""map_match vs a numpy brute-force snap oracle."""

import numpy as np
import pandas as pd

from htrc_ingester_spark.geo import h3lite as H
from htrc_ingester_spark.operators.map_match import map_match

M = float(H.M_PER_DEG_LAT)


def _snap_np(px, py, ax, ay, bx, by):
    k = np.cos(np.radians(py))
    dxab, dyab = (bx - ax) * k, by - ay
    len2 = dxab * dxab + dyab * dyab
    if len2 == 0.0:
        t = 0.0
    else:
        t = ((px - ax) * k * dxab + (py - ay) * dyab) / len2
        t = min(max(t, 0.0), 1.0)
    cx, cy = ax + t * (bx - ax), ay + t * (by - ay)
    return t, np.hypot((px - cx) * k, py - cy) * M


def _brute(pts, segs, radius_m):
    out = {}
    for p in pts.itertuples(index=False):
        best = None
        for s in segs.itertuples(index=False):
            t, d = _snap_np(p.lon, p.lat, s.ax, s.ay, s.bx, s.by)
            if d <= radius_m and (best is None or (d, s.seg_id) < (best[0], best[1])):
                best = (d, s.seg_id, t)
        if best is not None:
            out[p.image_id] = best
    return out


class TestMapMatch:
    def test_matches_bruteforce(self, spark):
        rng = np.random.default_rng(7)
        n_p, n_s = 300, 60
        pts = pd.DataFrame(
            {
                "image_id": [f"p{i}" for i in range(n_p)],
                "lon": rng.normal(10.0, 1.0, n_p),
                "lat": rng.normal(50.0, 0.8, n_p),
            }
        )
        ax = rng.normal(10.0, 1.0, n_s)
        ay = rng.normal(50.0, 0.8, n_s)
        segs = pd.DataFrame(
            {
                "seg_id": np.arange(n_s, dtype=np.int64),
                "ax": ax,
                "ay": ay,
                "bx": ax + rng.uniform(-0.5, 0.5, n_s),
                "by": ay + rng.uniform(-0.3, 0.3, n_s),
            }
        )
        # zero-length segment in the middle of the cluster
        segs.loc[0, ["bx", "by"]] = segs.loc[0, ["ax", "ay"]]
        radius = 40_000.0
        got = {
            r["image_id"]: (r["dist_m"], r["seg_id"], r["t"])
            for r in map_match(
                spark, spark.createDataFrame(pts), spark.createDataFrame(segs), radius
            ).collect()
        }
        want = _brute(pts, segs, radius)
        assert set(got) == set(want)
        for pid, (d, sid, t) in want.items():
            gd, gsid, gt = got[pid]
            assert gsid == sid, pid
            assert abs(gd - d) < 1e-6, pid
            assert abs(gt - t) < 1e-9, pid

    def test_t_clamps_beyond_endpoints(self, spark):
        segs = spark.createDataFrame(
            pd.DataFrame({"seg_id": [1], "ax": [0.0], "ay": [0.0], "bx": [1.0], "by": [0.0]})
        )
        pts = spark.createDataFrame(
            pd.DataFrame(
                {"image_id": ["before", "beyond", "mid"], "lon": [-0.5, 1.5, 0.25], "lat": [0.0, 0.0, 0.1]}
            )
        )
        rows = {r["image_id"]: r for r in map_match(spark, pts, segs, 200_000.0).collect()}
        assert rows["before"]["t"] == 0.0
        assert rows["beyond"]["t"] == 1.0
        assert abs(rows["mid"]["t"] - 0.25) < 1e-9
        assert abs(rows["before"]["dist_m"] - 0.5 * M) < 1.0

    def test_cross_cell_candidates_found(self, spark):
        # point sits in a different cell than the segment bbox; the
        # radius expansion must still pair them
        segs = spark.createDataFrame(
            pd.DataFrame({"seg_id": [1], "ax": [10.0], "ay": [50.0], "bx": [10.1], "by": [50.0]})
        )
        # ~30 km south of the segment
        pts = spark.createDataFrame(
            pd.DataFrame({"image_id": ["far"], "lon": [10.05], "lat": [50.0 - 30000.0 / M]})
        )
        rows = map_match(spark, pts, segs, 35_000.0).collect()
        assert len(rows) == 1 and abs(rows[0]["dist_m"] - 30000.0) < 50.0

    def test_plan_equi_join_argmin_no_window(self, spark):
        rng = np.random.default_rng(1)
        pts = spark.createDataFrame(
            pd.DataFrame({"image_id": ["a", "b"], "lon": [0.0, 1.0], "lat": [0.0, 1.0]})
        )
        segs = spark.createDataFrame(
            pd.DataFrame({"seg_id": [1], "ax": [0.0], "ay": [0.0], "bx": [1.0], "by": [1.0]})
        )
        plan = (
            map_match(spark, pts, segs, 50_000.0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan and "Window" not in plan
