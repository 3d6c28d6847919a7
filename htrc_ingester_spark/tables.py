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


def _max_version(table_dir: str) -> int | None:
    """Highest version ever written (snapshot dirs + lock markers), NOT
    the pointer: after a revert the pointer is behind, and a new commit
    must never silently overwrite a reverted-away snapshot."""
    best: int | None = None
    for name in os.listdir(table_dir):
        stem = name.removesuffix(".lock")
        if stem.startswith("v") and stem[1:].isdigit():
            v = int(stem[1:])
            best = v if best is None else max(best, v)
    return best


def commit(df: DataFrame, table_dir: str, note: str = "") -> int:
    """Write the next immutable snapshot and flip the pointer. Returns
    the new version number.

    Version allocation is ATOMIC: an O_CREAT|O_EXCL ``v<N>.lock``
    marker claims the number before any data is written, so two
    concurrent committers can never clobber each other's snapshot —
    the loser retries with the next number (the minimal analog of
    Iceberg's conflict-detecting commit; plain last-pointer-wins for
    the flip itself, which is the same row-level semantics as the
    reference's rename race)."""
    os.makedirs(table_dir, exist_ok=True)
    cur = _max_version(table_dir)
    version = 0 if cur is None else cur + 1
    while True:
        try:
            fd = os.open(
                os.path.join(table_dir, f"v{version}.lock"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            break
        except FileExistsError:
            version += 1
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


def revert(table_dir: str, version: int, note: str = "revert") -> int:
    """Walk the commit pointer BACKWARDS to an existing snapshot.

    The reference's revert tool (tools/RevertDeltaLogs.java:604-710)
    renames the on-disk state machine backwards (_VERIFIED_ →
    _PROCESSED_ → raw) so a stage genuinely re-runs; here the analogous
    O(1)-metadata move is flipping ``_LATEST`` to ``v<version>``.
    Later snapshots stay on disk for audit/time-travel; the commit log
    records the revert; a subsequent ``commit()`` allocates ABOVE the
    highest version ever written (``_max_version``), never overwriting
    a reverted-away snapshot. Pair with
    ``manifest.invalidate_partitions`` to make a downstream resumable
    stage recompute from the reverted table."""
    path = os.path.join(table_dir, f"v{version}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no snapshot v{version} in {table_dir}")
    cur = _latest_version(table_dir)
    with open(os.path.join(table_dir, _LOG), "a") as f:
        f.write(
            json.dumps(
                {
                    "version": version,
                    "ts": time.time(),
                    "note": note,
                    "reverted_from": cur,
                }
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


def compact(
    spark: SparkSession,
    table_dir: str,
    target_file_mb: int = 128,
    note: str = "compact",
) -> int:
    """Small-file compaction: rewrite the CURRENT snapshot as a new
    version with file sizes near ``target_file_mb`` (the Iceberg
    ``rewrite_data_files`` analog; on a real cluster this is the
    nightly job that keeps scan task counts sane after many
    incremental commits). Row-identical by construction — the new
    snapshot is a plain read→repartition→commit, and ``commit`` logs
    the row count either side of the rewrite for the audit trail.

    File count = ceil(current bytes / target), computed from the
    snapshot's on-disk size (driver-side listdir — exact, no sampling).
    Returns the new version number; old snapshots remain time-travel
    targets until :func:`expire_snapshots`.
    """
    version = _latest_version(table_dir)
    if version is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    path = os.path.join(table_dir, f"v{version}")
    size_b = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size_b // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path).repartition(int(n_files))
    return commit(df, table_dir, note=f"{note} v{version} -> {n_files} files")


def expire_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete old snapshot DIRECTORIES, keeping the pointer target and
    the ``keep_last`` highest version numbers (Iceberg
    ``expire_snapshots`` analog — bounds storage after compaction /
    churn). Time-travel to an expired version then fails loudly
    (FileNotFoundError), exactly like an expired Iceberg snapshot.

    The ``v<N>.lock`` markers are kept forever: they are bytes-sized
    and are what keeps version allocation monotone (a future commit
    must never reuse an expired number). The expiration is appended to
    the commit log. Returns the expired version numbers.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    import shutil

    current = _latest_version(table_dir)
    versions = sorted(
        int(name[1:])
        for name in os.listdir(table_dir)
        if name.startswith("v") and name[1:].isdigit() and os.path.isdir(os.path.join(table_dir, name))
    )
    keep = set(versions[-keep_last:])
    if current is not None:
        keep.add(current)
    expired = [v for v in versions if v not in keep]
    for v in expired:
        shutil.rmtree(os.path.join(table_dir, f"v{v}"))
    if expired:
        with open(os.path.join(table_dir, _LOG), "a") as f:
            f.write(
                json.dumps(
                    {"expired": expired, "ts": time.time(), "note": "expire_snapshots"}
                )
                + "\n"
            )
    return expired


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
