"""Versioned-table layer: commit/pointer atomicity, time travel, MERGE,
and collections membership (S11/S12/J6/SO2 parity on the Iceberg-style
commit log)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from htrc_ingester_spark import tables as T


def _df(spark, ids):
    return spark.createDataFrame([(i, f"row-{i}") for i in ids], "volume_id string, payload string")


def test_commit_read_history_time_travel(spark, tmp_path):
    d = str(tmp_path / "t")
    v0 = T.commit(_df(spark, ["a", "b"]), d, note="init")
    v1 = T.commit(_df(spark, ["a", "b", "c"]), d, note="grow")
    assert (v0, v1) == (0, 1)
    assert T.read(spark, d).count() == 3
    assert T.read(spark, d, version=0).count() == 2  # time travel
    h = T.history(d)
    assert [e["version"] for e in h] == [0, 1]
    assert h[0]["row_count"] == 2 and h[1]["note"] == "grow"


def test_torn_snapshot_never_moves_pointer(spark, tmp_path):
    d = str(tmp_path / "t")
    T.commit(_df(spark, ["a"]), d)
    # torn future write: directory exists, pointer untouched
    os.makedirs(os.path.join(d, "v1"), exist_ok=True)
    open(os.path.join(d, "v1", "part-garbage.parquet"), "wb").write(b"xx")
    assert T.read(spark, d).count() == 1  # still v0
    # next real commit claims v1 idempotently (overwrite) and flips
    T.commit(_df(spark, ["a", "b"]), d)
    assert T.read(spark, d).count() == 2


def test_merge_commit_applies_tombstones_and_upserts(spark, tmp_path):
    d = str(tmp_path / "t")
    T.commit(_df(spark, ["a", "b", "c"]), d)
    changes = spark.createDataFrame(
        [("a", "delete", 1, ""), ("d", "upsert", 2, "")],
        "volume_id string, op string, seq long, path string",
    )
    new_rows = _df(spark, ["d"])
    T.merge_commit(spark, d, changes, new_rows)
    got = sorted(r.volume_id for r in T.read(spark, d).collect())
    assert got == ["b", "c", "d"]
    # the pre-merge version is still readable (audit / revert parity
    # with RevertDeltaLogs.java)
    assert sorted(r.volume_id for r in T.read(spark, d, version=0).collect()) == ["a", "b", "c"]


def test_collections_membership_set_semantics(spark, tmp_path):
    d = str(tmp_path / "coll")
    ids1 = spark.createDataFrame([("x",), ("y",)], "id string")
    ids2 = spark.createDataFrame([("y",), ("z",)], "id string")
    T.add_members(spark, d, "ALL", ids1)
    T.add_members(spark, d, "ALL", ids2)  # y duplicated → set semantics
    T.add_members(spark, d, "PUBLIC", ids1)
    assert sorted(r.member_id for r in T.members(spark, d, "ALL").collect()) == ["x", "y", "z"]
    T.remove_members(spark, d, "ALL", spark.createDataFrame([("y",)], "id string"))
    assert sorted(r.member_id for r in T.members(spark, d, "ALL").collect()) == ["x", "z"]
    # removal is collection-scoped: PUBLIC still has y
    assert sorted(r.member_id for r in T.members(spark, d, "PUBLIC").collect()) == ["x", "y"]


def test_revert_walks_pointer_backwards_and_never_overwrites(spark, tmp_path):
    """REF tools/RevertDeltaLogs.java:604-710 parity: revert makes the
    stage genuinely re-run from the old state, and a post-revert commit
    allocates ABOVE the highest version ever written."""
    d = str(tmp_path / "t")
    T.commit(_df(spark, ["a"]), d, note="v0")
    T.commit(_df(spark, ["a", "b"]), d, note="v1")
    T.commit(_df(spark, ["a", "b", "c"]), d, note="v2")
    assert T.revert(d, 1) == 1
    assert T.read(spark, d).count() == 2           # pointer is back at v1
    assert T.read(spark, d, version=2).count() == 3  # v2 kept for audit
    v3 = T.commit(_df(spark, ["x"]), d, note="after-revert")
    assert v3 == 3                                  # above max-ever, not v2
    assert T.read(spark, d).count() == 1
    notes = [e.get("note") for e in T.history(d)]
    assert "revert" in notes


def test_revert_to_missing_version_raises(spark, tmp_path):
    d = str(tmp_path / "t")
    T.commit(_df(spark, ["a"]), d)
    with pytest.raises(FileNotFoundError):
        T.revert(d, 7)


def test_concurrent_commit_version_allocation_is_atomic(spark, tmp_path):
    """Two committers racing for the same version: the lock marker
    forces distinct version numbers (no silent snapshot clobber)."""
    import os

    d = str(tmp_path / "t")
    T.commit(_df(spark, ["a"]), d)
    # simulate a concurrent committer that already claimed v1
    open(os.path.join(d, "v1.lock"), "w").close()
    v = T.commit(_df(spark, ["a", "b"]), d)
    assert v == 2
    assert T.read(spark, d).count() == 2


class TestMaintenance:
    def test_compact_rewrites_rows_identically(self, spark, tmp_path):
        from htrc_ingester_spark import tables as T

        d = str(tmp_path / "t")
        # many tiny files: 20 partitions of 50 rows
        df = spark.range(1000).repartition(20)
        v0 = T.commit(df, d, note="initial")
        files_before = [
            f for f in os.listdir(os.path.join(d, f"v{v0}")) if f.endswith(".parquet")
        ]
        assert len(files_before) == 20
        v1 = T.compact(spark, d, target_file_mb=128)
        assert v1 == v0 + 1
        files_after = [
            f for f in os.listdir(os.path.join(d, f"v{v1}")) if f.endswith(".parquet")
        ]
        assert len(files_after) == 1  # 1000 longs << 128 MB
        got = {r.id for r in T.read(spark, d).collect()}
        assert got == set(range(1000))
        assert any("compact" in h.get("note", "") for h in T.history(d))

    def test_expire_keeps_pointer_and_monotone_versions(self, spark, tmp_path):
        from htrc_ingester_spark import tables as T

        d = str(tmp_path / "t")
        for i in range(4):
            T.commit(spark.range(10 + i), d, note=f"c{i}")  # v0..v3
        expired = T.expire_snapshots(d, keep_last=2)
        assert expired == [0, 1]
        # current still reads; expired time-travel fails loudly
        assert T.read(spark, d).count() == 13
        with pytest.raises(Exception):
            T.read(spark, d, version=0).count()
        with pytest.raises(FileNotFoundError):
            T.revert(d, 0)
        # version allocation stays monotone (locks retained)
        v = T.commit(spark.range(99), d, note="after-expire")
        assert v == 4
        assert any("expire_snapshots" in h.get("note", "") for h in T.history(d))

    def test_expire_never_removes_reverted_to_target(self, spark, tmp_path):
        from htrc_ingester_spark import tables as T

        d = str(tmp_path / "t")
        for i in range(4):
            T.commit(spark.range(10 + i), d)  # v0..v3
        T.revert(d, 1)
        expired = T.expire_snapshots(d, keep_last=1)
        # pointer target v1 survives even though only v3 is "newest"
        assert 1 not in expired and T.read(spark, d).count() == 11
