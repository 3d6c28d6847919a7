"""Trajectory segmentation + stats vs a pure-Python oracle."""

import math

import numpy as np
import pandas as pd
import pytest

from htrc_ingester_spark.operators.trajectory import trajectory_stats


def hav_m(lat1, lon1, lat2, lon2):
    r = math.radians
    return (
        2.0
        * 6371008.8
        * math.asin(
            math.sqrt(
                math.sin((r(lat2) - r(lat1)) / 2) ** 2
                + math.cos(r(lat1)) * math.cos(r(lat2)) * math.sin((r(lon2) - r(lon1)) / 2) ** 2
            )
        )
    )


def brute(pdf, gap_s=None):
    rows = []
    for eid, g in pdf.groupby("entity_id"):
        g = g.sort_values("t")
        seg, prev = 0, None
        tracks = {}
        for r in g.itertuples(index=False):
            if prev is not None and gap_s is not None and r.t - prev.t > gap_s:
                seg += 1
                leg = None
            elif prev is not None:
                leg = hav_m(prev.lat, prev.lon, r.lat, r.lon)
            else:
                leg = None
            tracks.setdefault(seg, []).append((r.t, leg))
            prev = r
        for s, pts in tracks.items():
            ts = [t for t, _ in pts]
            legs = [l for _, l in pts if l is not None]
            rows.append(
                {
                    "entity_id": eid,
                    "segment": s,
                    "n_points": len(pts),
                    "duration_s": max(ts) - min(ts),
                    "total_m": sum(legs) if legs else 0.0,
                    "max_leg_m": max(legs) if legs else None,
                }
            )
    return pd.DataFrame(rows).sort_values(["entity_id", "segment"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def track_pdf():
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame(
        {
            "entity_id": rng.randint(0, 12, n),
            "t": rng.permutation(n).astype(float) * 40.0,  # unique → deterministic order
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-85, 85, n),
        }
    )


def test_matches_bruteforce_with_gaps(spark, track_pdf):
    got = (
        trajectory_stats(
            spark.createDataFrame(track_pdf), id_col="entity_id", ts_col="t", gap_s=900.0
        )
        .toPandas()
        .sort_values(["entity_id", "segment"])
        .reset_index(drop=True)
    )
    want = brute(track_pdf, gap_s=900.0)
    assert list(got["entity_id"]) == list(want["entity_id"])
    assert list(got["segment"]) == list(want["segment"])
    assert list(got["n_points"]) == list(want["n_points"])
    assert np.allclose(got["duration_s"], want["duration_s"])
    assert np.allclose(got["total_m"], want["total_m"])
    assert np.allclose(
        got["max_leg_m"].fillna(-1), want["max_leg_m"].fillna(-1)
    )
    # avg speed is total/duration where duration > 0
    mask = got["duration_s"] > 0
    assert np.allclose(
        got.loc[mask, "avg_speed_mps"],
        got.loc[mask, "total_m"] / got.loc[mask, "duration_s"],
    )
    assert (got["segment"] > 0).any()  # the gap actually split tracks


def test_no_gap_one_row_per_entity(spark, track_pdf):
    got = trajectory_stats(
        spark.createDataFrame(track_pdf), id_col="entity_id", ts_col="t"
    ).toPandas()
    assert "segment" not in got.columns
    assert len(got) == track_pdf["entity_id"].nunique()
    want = brute(track_pdf)
    merged = got.sort_values("entity_id").reset_index(drop=True)
    assert np.allclose(merged["total_m"], want["total_m"])


def test_single_point_and_bridge_leg_excluded(spark):
    pdf = pd.DataFrame(
        {
            "entity_id": [1, 2, 2, 2],
            "t": [0.0, 0.0, 10.0, 5000.0],
            "lon": [0.0, 0.0, 1.0, 2.0],
            "lat": [0.0, 0.0, 0.0, 0.0],
        }
    )
    got = {
        (r["entity_id"], r["segment"]): r
        for r in trajectory_stats(
            spark.createDataFrame(pdf), id_col="entity_id", ts_col="t", gap_s=100.0
        ).collect()
    }
    # single-point entity: zero distance, null max leg / speed
    assert got[(1, 0)]["n_points"] == 1
    assert got[(1, 0)]["total_m"] == 0.0
    assert got[(1, 0)]["max_leg_m"] is None
    assert got[(1, 0)]["avg_speed_mps"] is None
    # entity 2 splits at the 10→5000 jump; the bridging leg counts nowhere
    assert got[(2, 0)]["n_points"] == 2
    assert abs(got[(2, 0)]["total_m"] - hav_m(0, 0, 0, 1)) < 1e-6
    assert got[(2, 1)]["n_points"] == 1
    assert got[(2, 1)]["total_m"] == 0.0


def test_plan_single_exchange(spark, track_pdf):
    """Window (lag + running sum) and the rollup share one entity-hash
    exchange — the aggregate reuses the window's partitioning."""
    plan = (
        trajectory_stats(
            spark.createDataFrame(track_pdf), id_col="entity_id", ts_col="t", gap_s=900.0
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


class TestGeofenceTransitions:
    ZONES = [
        {"poly_id": "za", "ring": [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]},
        {"poly_id": "zb", "ring": [(2.0, 0.0), (3.0, 0.0), (3.0, 1.0), (2.0, 1.0), (2.0, 0.0)]},
        # zc overlaps za — 'za' < 'zc', so the min-poly_id rule picks za
        {"poly_id": "zc", "ring": [(0.5, 0.0), (1.5, 0.0), (1.5, 1.0), (0.5, 1.0), (0.5, 0.0)]},
    ]

    def _run(self, spark, rows):
        from htrc_ingester_spark.operators.trajectory import geofence_transitions

        pts = spark.createDataFrame(
            rows, "point_id long, entity_id long, t double, lon double, lat double"
        )
        got = geofence_transitions(
            spark, pts, self.ZONES, id_col="entity_id", ts_col="t",
            key_col="point_id", res=3
        ).toPandas()
        return sorted(
            (r.entity_id, r.t, r.from_zone, r.to_zone, r.kind)
            for r in got.itertuples(index=False)
        )

    def test_enter_exit_switch_walkthrough(self, spark):
        rows = [
            # entity 1: outside → za → za → zb → outside
            (10, 1, 1.0, -5.0, 0.5),
            (11, 1, 2.0, 0.2, 0.5),
            (12, 1, 3.0, 0.3, 0.5),
            (13, 1, 4.0, 2.5, 0.5),
            (14, 1, 5.0, 9.0, 9.0),
            # entity 2: starts INSIDE zb → first-point enter
            (20, 2, 1.0, 2.1, 0.1),
            # entity 3: never inside → no rows
            (30, 3, 1.0, -40.0, -40.0),
            (31, 3, 2.0, -41.0, -40.0),
        ]
        got = self._run(spark, rows)
        assert got == [
            (1, 2.0, None, "za", "enter"),
            (1, 4.0, "za", "zb", "switch"),
            (1, 5.0, "zb", None, "exit"),
            (2, 1.0, None, "zb", "enter"),
        ]

    def test_overlap_resolves_to_min_poly_id(self, spark):
        rows = [
            (1, 7, 1.0, 0.75, 0.5),   # inside BOTH za and zc → za
            (2, 7, 2.0, 1.25, 0.5),   # inside zc only → switch za→zc
        ]
        got = self._run(spark, rows)
        assert got == [
            (7, 1.0, None, "za", "enter"),
            (7, 2.0, "za", "zc", "switch"),
        ]


class TestTrajectoryResample:
    def _run(self, spark, rows, dt=10.0, max_gap=None):
        from htrc_ingester_spark.operators.trajectory import trajectory_resample

        pts = spark.createDataFrame(rows, "entity_id long, t double, lon double, lat double")
        got = trajectory_resample(
            pts, dt=dt, id_col="entity_id", ts_col="t", max_gap_s=max_gap
        ).toPandas()
        return sorted(
            (r.entity_id, r.tick_ts, round(r.lon, 9), round(r.lat, 9))
            for r in got.itertuples(index=False)
        )

    def test_linear_interpolation_on_grid(self, spark):
        # one leg (0,0)@t=5 → (10,20)@t=35: ticks at 10,20,30
        rows = [(1, 5.0, 0.0, 0.0), (1, 35.0, 10.0, 20.0)]
        got = self._run(spark, rows, dt=10.0)
        want = [
            (1, 10.0, 10 * (5 / 30), 20 * (5 / 30)),
            (1, 20.0, 10 * (15 / 30), 20 * (15 / 30)),
            (1, 30.0, 10 * (25 / 30), 20 * (25 / 30)),
        ]
        assert [(e, t) for e, t, *_ in got] == [(e, t) for e, t, *_ in want]
        for g, w in zip(got, want):
            assert abs(g[2] - w[2]) < 1e-9 and abs(g[3] - w[3]) < 1e-9

    def test_halfopen_span_includes_start_excludes_end(self, spark):
        # fixes exactly on ticks: t0 emits, t1 does not (it is the next
        # leg's t0 when the track continues)
        rows = [(1, 10.0, 0.0, 0.0), (1, 20.0, 1.0, 1.0), (1, 30.0, 2.0, 2.0)]
        got = self._run(spark, rows, dt=10.0)
        assert [(e, t) for e, t, *_ in got] == [(1, 10.0), (1, 20.0)]
        assert got[0][2:] == (0.0, 0.0) and got[1][2:] == (1.0, 1.0)

    def test_max_gap_suppresses_outage_spans(self, spark):
        rows = [(1, 0.0, 0.0, 0.0), (1, 1000.0, 5.0, 5.0), (1, 1010.0, 6.0, 6.0)]
        got = self._run(spark, rows, dt=10.0, max_gap=50.0)
        # only the 1000→1010 leg emits (its t0 tick)
        assert [(e, t) for e, t, *_ in got] == [(1, 1000.0)]

    def test_single_point_entity_emits_nothing(self, spark):
        assert self._run(spark, [(9, 7.0, 1.0, 1.0)], dt=10.0) == []
