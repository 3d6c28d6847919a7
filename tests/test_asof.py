"""As-of join semantics: backward-inclusive match, deterministic ties,
no-match nulls — pinned against a hand-computed fixture."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from htrc_ingester_spark.operators.asof_join import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [10, 11, 12, 13],
                "ts": [_ts(5), _ts(10), _ts(10), _ts(1)],
                "user_id": [1, 1, 2, 2],
                "value": [0.0, 0.0, 0.0, 0.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [100, 101, 102, 103],
                "ts": [_ts(5), _ts(3), _ts(10), _ts(10)],
                "user_id": [1, 1, 2, 2],
                "value": [1.5, 2.5, 3.5, 4.5],
            }
        )
    )
    return left, right


def test_backward_inclusive_and_ties(spark, sides):
    left, right = sides
    got = (
        asof_join(left, right)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    # user 1, click at t=5: view 100 at t=5 matches INCLUSIVELY
    assert got.loc[10, "asof_event_id"] == 100
    # user 1, click at t=10: latest view still 100 (t=5)
    assert got.loc[11, "asof_event_id"] == 100
    # user 2, click at t=10: TWO views at t=10 → highest event_id wins
    assert got.loc[12, "asof_event_id"] == 103
    assert got.loc[12, "asof_value"] == 4.5
    # user 2, click at t=1: nothing precedes → null payload
    assert pd.isna(got.loc[13, "asof_event_id"])


def test_atomic_payload_fill_with_null_field(spark):
    """The matched right row's payload must come from ONE row: a null
    field in the latest right row stays null, never back-filled from an
    older right row (regression: per-column last(ignorenulls) mixed
    rows)."""
    left = spark.createDataFrame(
        pd.DataFrame(
            {"event_id": [10], "ts": [_ts(30)], "user_id": [1], "value": [0.0]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [100, 101],
                "ts": [_ts(5), _ts(20)],
                "user_id": [1, 1],
                "value": [2.0, None],
            }
        )
    )
    got = asof_join(left, right).toPandas().iloc[0]
    assert got["asof_event_id"] == 101
    assert pd.isna(got["asof_value"])  # NOT 2.0 from event 100


def test_plan_single_exchange(spark, sides):
    left, right = sides
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    # the union-spine construction: no join operator at all, one
    # window after exactly one (non-broadcast) key exchange
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1


def test_random_parity_with_pandas_merge_asof(spark):
    """Independent oracle: pandas.merge_asof (backward, inclusive,
    last-right-row-wins on equal ts when right is sorted by
    (ts, event_id)) must agree on randomized keyed event sets."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 400
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_l),
            "ts": pd.to_datetime(rng.integers(0, 5000, n_l), unit="s"),
            "user_id": rng.integers(0, 20, n_l),
            "value": np.zeros(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "event_id": np.arange(1000, 1000 + n_r),
            "ts": pd.to_datetime(rng.integers(0, 5000, n_r), unit="s"),
            "user_id": rng.integers(0, 20, n_r),
            "value": rng.normal(size=n_r).round(3),
        }
    )
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values(["ts", "event_id"], kind="mergesort"),
        right.sort_values(["ts", "event_id"], kind="mergesort")
        .rename(columns={"event_id": "asof_event_id", "value": "asof_value"}),
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["asof_event_id"].astype("float64"),
        want["asof_event_id"].astype("float64"),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        got["asof_value"].astype("float64"),
        want["asof_value"].astype("float64"),
        check_names=False,
    )
