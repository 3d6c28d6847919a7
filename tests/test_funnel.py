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


def test_cohort_retention_hand_fixture(spark, tmp_path):
    """Cohort = epoch-week of first signup; a user active k weeks later
    counts once per (cohort, offset); pre-signup activity ignored by
    the week >= cohort_week guard."""
    from htrc_ingester_spark.plans.catalog import _cohort_retention

    rows = [
        # user 1 signs up week W, active W and W+2
        (0, "2024-01-01 10:00:00", 1, "signup", 0.0, ""),
        (1, "2024-01-02 10:00:00", 1, "click", 0.0, ""),
        (2, "2024-01-16 10:00:00", 1, "view", 0.0, ""),
        # user 2 signs up W+1, active only that week (signup itself counts)
        (3, "2024-01-08 10:00:00", 2, "signup", 0.0, ""),
        # user 3 never signs up -> excluded entirely
        (4, "2024-01-01 10:00:00", 3, "click", 0.0, ""),
        # user 4: activity BEFORE its signup week is ignored
        (5, "2024-01-01 10:00:00", 4, "click", 0.0, ""),
        (6, "2024-01-08 11:00:00", 4, "signup", 0.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in _cohort_retention(spark, sf).collect()
    }
    # 2024-01-01 is a Monday; epoch-week boundaries are Thursdays
    # (epoch day 0 = Thu), but RELATIVE offsets are what the assertions
    # pin: user 1 contributes offsets {0, 2}; users 2 and 4 offset {0}
    # one week later
    w1 = [k for k, v in got.items()]
    assert len(got) == 3
    offs = sorted(o for (_, o) in got)
    assert offs == [0, 0, 2]
    assert all(v >= 1 for v in got.values())


def test_sliding_window_hand_fixture(spark, tmp_path):
    """One event lands in exactly window/slide = 2 windows, with
    epoch-aligned starts."""
    from htrc_ingester_spark.plans.catalog import _SLIDE_US, _sliding_counts

    rows = [(0, "2024-01-01 00:07:00", 1, "click", 1.0, "")]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.window_start_us, r.event_type): r.n
        for r in _sliding_counts(spark, sf).collect()
    }
    import pandas as pd

    t = int(pd.Timestamp("2024-01-01 00:07:00").value // 1000)
    slot = (t // _SLIDE_US) * _SLIDE_US
    assert got == {(slot, "click"): 1, (slot - _SLIDE_US, "click"): 1}
