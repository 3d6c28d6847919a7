"""Versioned table layer: Iceberg-style commit log on plain parquet.

The reference's durable state machine is filesystem renames; Iceberg's
is a metadata pointer over immutable snapshots. With no Iceberg jar in
this container (BENCH.md), this module provides the minimal contract
the engine needs, on plain parquet:

- ``commit``  — write an immutable snapshot ``v<N>`` then atomically
  flip the ``_LATEST`` pointer (os.replace — the rename-as-commit of
  both the reference and Iceberg);
- ``read``    — latest or any historical version (time travel);
- ``history`` — the commit log (version, timestamp, row_count, note);
- ``merge_commit`` — apply a CDC change set (ingest.apply_changes) to
  the latest version and commit the result — MERGE INTO;
- crash safety: a torn snapshot write never moves the pointer; a
  replayed commit with the same version overwrites idempotently.

On a real cluster each call maps 1:1 to the Iceberg equivalents
(``writeTo().createOrReplace()``, ``VERSION AS OF``, MERGE INTO);
callers never touch paths, so swapping the backend is confined here.

Collections parity (HectorManager.java:340-407): a collections table
``(collection, member_id)`` committed through this layer gives the
reference's valueless-column membership sets with set-semantics
guaranteed by ``add_members``/``remove_members``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ingest as I

_PTR = "_LATEST"
_LOG = "_commits.jsonl"


def _latest_version(table_dir: str) -> int | None:
    ptr = os.path.join(table_dir, _PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip().lstrip("v"))


def commit(df: DataFrame, table_dir: str, note: str = "") -> int:
    """Write the next immutable snapshot and flip the pointer. Returns
    the new version number."""
    os.makedirs(table_dir, exist_ok=True)
    cur = _latest_version(table_dir)
    version = 0 if cur is None else cur + 1
    path = os.path.join(table_dir, f"v{version}")
    df.write.mode("overwrite").parquet(path)
    n = df.sparkSession.read.parquet(path).count()
    with open(os.path.join(table_dir, _LOG), "a") as f:
        f.write(
            json.dumps(
                {"version": version, "ts": time.time(), "row_count": n, "note": note}
            )
            + "\n"
        )
    tmp = os.path.join(table_dir, _PTR + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"v{version}")
    os.replace(tmp, os.path.join(table_dir, _PTR))
    return version


def read(spark: SparkSession, table_dir: str, version: int | None = None) -> DataFrame:
    """Latest (default) or time-travel read of a specific version."""
    if version is None:
        version = _latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed version in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v{version}"))


def history(table_dir: str) -> list[dict]:
    log = os.path.join(table_dir, _LOG)
    if not os.path.exists(log):
        return []
    with open(log) as f:
        return [json.loads(line) for line in f if line.strip()]


def merge_commit(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    new_rows: DataFrame,
    key: str = "volume_id",
    note: str = "merge",
) -> int:
    """MERGE INTO the latest version (tombstones delete, upserts
    overlay — ingest.apply_changes) and commit the result."""
    try:
        snapshot = read(spark, table_dir)
    except FileNotFoundError:
        snapshot = new_rows.limit(0)
    merged = I.apply_changes(snapshot, changes, new_rows, key=key)
    return commit(merged, table_dir, note=note)


# ---------------------------------------------------------------------------
# Collections membership (J6/SO2 parity over the versioned layer)
# ---------------------------------------------------------------------------


def add_members(
    spark: SparkSession, table_dir: str, collection: str, member_ids: DataFrame
) -> int:
    """Idempotent set-insert (HectorManager.java:340-407 valueless
    columns): union + distinct, committed as a new version."""
    add = member_ids.select(
        F.lit(collection).alias("collection"),
        F.col(member_ids.columns[0]).alias("member_id"),
    )
    try:
        cur = read(spark, table_dir)
        merged = cur.unionByName(add).distinct()
    except FileNotFoundError:
        merged = add.distinct()
    return commit(merged, table_dir, note=f"add:{collection}")


def remove_members(
    spark: SparkSession, table_dir: str, collection: str, member_ids: DataFrame
) -> int:
    """SO2 except: delete members from one collection (anti-join)."""
    cur = read(spark, table_dir)
    rm = member_ids.select(
        F.lit(collection).alias("collection"),
        F.col(member_ids.columns[0]).alias("member_id"),
    )
    kept = cur.join(rm, ["collection", "member_id"], "left_anti")
    return commit(kept, table_dir, note=f"remove:{collection}")


def members(spark: SparkSession, table_dir: str, collection: str) -> DataFrame:
    return (
        read(spark, table_dir)
        .where(F.col("collection") == collection)
        .select("member_id")
    )
