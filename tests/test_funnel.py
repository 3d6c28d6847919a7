"""events_funnel_stages semantics on a hand fixture: strictly-after
ordering, per-stage gap bound, earliest-event selection."""

from __future__ import annotations

import pandas as pd

from htrc_ingester_spark.plans.catalog import _FUNNEL_GAP_US, _funnel


def _write_events(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    d = tmp_path / "sf"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_funnel_hand_fixture(spark, tmp_path):
    gap_h = _FUNNEL_GAP_US // 3_600_000_000
    rows = [
        # user 1: view → click(+1h) → purchase(+2h): stage 3
        (0, "2024-01-01 00:00:00", 1, "view", 0.0, ""),
        (1, "2024-01-01 01:00:00", 1, "click", 0.0, ""),
        (2, "2024-01-01 03:00:00", 1, "purchase", 0.0, ""),
        # user 2: click BEFORE the first view → stage 1 (strictly-after)
        (3, "2024-01-01 05:00:00", 2, "click", 0.0, ""),
        (4, "2024-01-01 06:00:00", 2, "view", 0.0, ""),
        # user 3: click beyond the gap bound → stage 1
        (5, "2024-01-01 00:00:00", 3, "view", 0.0, ""),
        (6, f"2024-01-{3 + gap_h // 24:02d} 01:00:00", 3, "click", 0.0, ""),
        # user 4: view → click, purchase too late after click → stage 2
        (7, "2024-01-01 00:00:00", 4, "view", 0.0, ""),
        (8, "2024-01-01 00:30:00", 4, "click", 0.0, ""),
        (9, f"2024-01-{3 + gap_h // 24:02d} 02:00:00", 4, "purchase", 0.0, ""),
        # user 5: purchase only (no view) → stage 0
        (10, "2024-01-01 00:00:00", 5, "purchase", 0.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.stage: r.n_users for r in _funnel(spark, sf).collect()}
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}
