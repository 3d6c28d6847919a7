"""interval_join (operators/intervals.py) vs a brute-force quadratic
oracle: exactly-once emission across bin widths, half-open endpoint
semantics, plan shape."""

from __future__ import annotations

import random

import pytest

from htrc_ingester_spark.operators.intervals import interval_join


def brute(a, b):
    return {
        (ia, ib, min(ea, eb) - max(sa, sb))
        for ia, sa, ea in a
        for ib, sb, eb in b
        if sa < eb and sb < ea
    }


def rand_intervals(rng, n, span, max_len):
    return [
        (i, s, s + rng.randrange(1, max_len))
        for i, s in enumerate(rng.randrange(span) for _ in range(n))
    ]


@pytest.mark.parametrize("seed,bin_us", [(1, 10), (2, 100), (3, 1000), (4, 37)])
def test_matches_bruteforce_across_bin_widths(spark, seed, bin_us):
    rng = random.Random(seed)
    a = rand_intervals(rng, 60, span=2000, max_len=300)
    b = rand_intervals(rng, 60, span=2000, max_len=50)
    adf = spark.createDataFrame(a, "id long, s long, e long")
    bdf = spark.createDataFrame(b, "id long, s long, e long")
    got = {
        (r.a_id, r.b_id, r.overlap_us)
        for r in interval_join(adf, bdf, bin_us=bin_us).collect()
    }
    assert got == brute(a, b)


def test_half_open_touching_endpoints_do_not_overlap(spark):
    a = [(0, 0, 100)]
    b = [(0, 100, 200), (1, 99, 200), (2, 0, 100)]
    adf = spark.createDataFrame(a, "id long, s long, e long")
    bdf = spark.createDataFrame(b, "id long, s long, e long")
    got = {
        (r.b_id, r.overlap_us)
        for r in interval_join(adf, bdf, bin_us=64).collect()
    }
    assert got == {(1, 1), (2, 100)}


def test_one_join_no_distinct(spark):
    adf = spark.createDataFrame([(0, 0, 10)], "id long, s long, e long")
    bdf = spark.createDataFrame([(0, 5, 15)], "id long, s long, e long")
    plan = (
        interval_join(adf, bdf, bin_us=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
    assert "Deduplicate" not in plan and plan.count("HashAggregate") == 0
