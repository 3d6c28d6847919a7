"""Incremental-ingest (CDC) pipeline parity — the reference's phase 2/3
re-expressed as relational operators (SURVEY.md §2.1 S4/S11/S12, §2.3
J3/J4/J5, §3.1).

The reference tails rsync verbose output into "delta logs", classifies
each line (header / delete / zip / mets — DeltaLogParser.java:279-330),
collapses repeated lines per volume last-writer-wins into upsert and
delete maps (:242-244,378-411), pushes them as batched mutations with
tombstones (HectorManager.java:146-248), then re-reads and re-verifies
(verify/Verifier.java:288-333). Here:

- ``parse_delta_log``  — line classification + volume-id projection as
  pure column expressions (whole-stage codegen; no UDF);
- ``collapse_changes`` — last-writer-wins by explicit ``seq`` (a total
  order; the reference relies on file order, which is not reproducible
  under parallelism — an explicit sequence column is);
- ``apply_changes``    — MERGE semantics: tombstone anti-join + upsert
  last-writer overlay, as one declarative plan (Iceberg's MERGE INTO
  compiles to the same shape);
- ``snapshot_diff``    — the CDC *generator*: diff two snapshots into
  upserts + deletes (what the rsync delta is to the pairtree);
- ``validate``         — computed-vs-declared join, failures routed to
  an error channel instead of aborting (J5).

Scale notes: every operator here is a plain equi join / window on the
change-set key — shuffles are proportional to the CHANGE volume, not
the corpus (the reference's core economy, SURVEY.md §3.2). Applying
changes to a 10^12-row table means joining the small change set against
only the partitions it touches (partition-prune by bucket of the key,
then dynamic-overwrite those partitions — manifest.write_resumable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# line classes (DeltaLogParser.java:279-330)
KIND_HEADER = "header"
KIND_DELETE = "delete"
KIND_ZIP = "upsert_zip"
KIND_METS = "upsert_mets"
KIND_OTHER = "other"


def classify_line(line):
    """rsync-verbose line → kind, as a column expression (F4)."""
    c = F.col(line) if isinstance(line, str) else line
    return (
        F.when(
            c.startswith("DEST_ROOT=") | c.startswith("PREFIX=") | c.startswith("COPYRIGHT="),
            F.lit(KIND_HEADER),
        )
        .when(c.startswith("deleting "), F.lit(KIND_DELETE))
        .when(c.endswith(".zip"), F.lit(KIND_ZIP))
        .when(c.endswith(".mets.xml"), F.lit(KIND_METS))
        .otherwise(F.lit(KIND_OTHER))
    )


def extract_failed_ids(df: DataFrame, id_col: str = "volume_id",
                       err_col: str = "error") -> DataFrame:
    """Distinct ids whose row carries an error-channel value — the feed
    for point repair (REF tools/ExtractVIDFromErrorLogs.java: grep the
    error logs for volume ids, re-ingest exactly those; here the error
    channel is a COLUMN, so the extraction is a filter+distinct instead
    of log parsing). Pipe into ``manifest.repair_partitions`` or a
    targeted re-run."""
    return df.where(F.col(err_col).isNotNull()).select(id_col).distinct()


COPYRIGHT_ENUM = ("PUBLIC_DOMAIN", "IN_COPYRIGHT")


def validate_copyright(df: DataFrame, col: str = "copyright",
                       out_col: str = "copyright_enum", err_col: str = "error") -> DataFrame:
    """C6: enum parse/validate with invalid→error-channel.

    REF Constants.java:114-117 (CopyrightEnum {PUBLIC_DOMAIN,
    IN_COPYRIGHT}) + DeltaLogParser.java:318-322 (valueOf on the
    COPYRIGHT header value) — except an invalid value routes to the
    error channel instead of throwing out of the parse thread, per the
    engine's never-drop-silently discipline."""
    v = F.col(col)
    valid = v.isin(*COPYRIGHT_ENUM)
    new_err = F.when(
        ~F.coalesce(valid, F.lit(False)),
        F.concat(F.lit("invalid copyright: "), F.coalesce(v, F.lit("<null>"))),
    )
    if err_col in df.columns:
        # never erase an upstream validator's error (the error channel
        # accumulates; extract_failed_ids must still see earlier rows)
        new_err = F.coalesce(F.col(err_col), new_err)
    return df.withColumn(out_col, F.when(valid, v)).withColumn(err_col, new_err)


def path_to_volume_id(path):
    """Leaf filename (minus extension), pairtree-uncleaned → volume id
    (F5: DeltaLogParser.java:423-452 line→volumeID; the clean/unclean
    maps are the public pairtree spec: '+'→':', '='→'/', ','→'.')."""
    c = F.col(path) if isinstance(path, str) else path
    leaf = F.element_at(F.split(c, "/"), -1)
    stem = F.regexp_replace(leaf, r"(\.mets)?\.(zip|xml)$", "")
    return F.translate(stem, "+=,", ":/.")


def classified_line_cols(line_col: str):
    """(kind, path) column pair for one raw delta-log line — the ONE
    copy of the line grammar (kind classification + the 'deleting '
    strip), shared by :func:`parse_delta_log` and the streaming
    stateful collapse so the two feeds can never diverge on it."""
    kind = classify_line(line_col)
    path = F.when(
        kind == KIND_DELETE, F.regexp_replace(F.col(line_col), "^deleting ", "")
    ).otherwise(F.col(line_col))
    return kind, path


def parse_delta_log(df: DataFrame, line_col: str = "value", seq_col: str = "seq") -> DataFrame:
    """Classified change stream: (seq, kind, path, volume_id).

    ``seq`` must be a monotone total order over lines (file offset,
    ingest timestamp, …) — it drives last-writer-wins downstream.
    """
    kind, path = classified_line_cols(line_col)
    out = df.select(
        F.col(seq_col).cast("long").alias("seq"),
        kind.alias("kind"),
        path.alias("path"),
    )
    return out.withColumn(
        "volume_id",
        F.when(
            F.col("kind").isin(KIND_DELETE, KIND_ZIP, KIND_METS),
            path_to_volume_id(F.col("path")),
        ),
    )


def collapse_changes(parsed: DataFrame) -> DataFrame:
    """Last-writer-wins per volume (J3, DeltaLogParser.java:242-244):
    of all upsert/delete lines for a volume, only the one with the
    highest ``seq`` survives. Returns (volume_id, op, seq, path) with
    op ∈ {upsert, delete}."""
    ops = parsed.where(F.col("kind").isin(KIND_DELETE, KIND_ZIP, KIND_METS)).withColumn(
        "op", F.when(F.col("kind") == KIND_DELETE, F.lit("delete")).otherwise(F.lit("upsert"))
    )
    w = Window.partitionBy("volume_id").orderBy(F.col("seq").desc())
    return (
        ops.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("volume_id", "op", "seq", "path")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    new_rows: DataFrame,
    key: str = "volume_id",
) -> DataFrame:
    """MERGE: tombstones delete (S12/J4 anti-join), upserts overlay
    last-writer-wins (S11). ``changes`` is collapse_changes output;
    ``new_rows`` carries the full row content for upserted keys.

    Equivalent Iceberg SQL::

        MERGE INTO snapshot t USING changes s ON t.k = s.k
        WHEN MATCHED AND s.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT *
    """
    touched = changes.select(key).distinct()
    untouched = snapshot.join(touched, key, "left_anti")
    upserted_keys = changes.where(F.col("op") == "upsert").select(key)
    upserts = new_rows.join(upserted_keys, key, "left_semi")
    return untouched.unionByName(upserts)


def snapshot_diff(new: DataFrame, old: DataFrame, key: str = "volume_id") -> DataFrame:
    """CDC generator (the Spark analog of the rsync delta, SURVEY.md
    §1.3): rows only in ``new`` → op 'insert', rows only in ``old`` →
    'delete', changed rows → 'update'. Changes are detected by a
    full-row hash so only key+hash columns shuffle; content never
    moves."""
    cols = [c for c in new.columns if c != key]
    h = F.xxhash64(*[F.col(c) for c in cols])
    n = new.select(key, h.alias("_h_new"))
    o = old.select(key, h.alias("_h_old"))
    j = n.join(o, key, "full_outer")
    return j.select(
        key,
        F.when(F.col("_h_old").isNull(), F.lit("insert"))
        .when(F.col("_h_new").isNull(), F.lit("delete"))
        .when(F.col("_h_new") != F.col("_h_old"), F.lit("update"))
        .alias("op"),
    ).where(F.col("op").isNotNull())


def validate(
    df: DataFrame,
    computed,
    declared_col: str,
    id_col: str = "volume_id",
) -> tuple[DataFrame, DataFrame]:
    """J5 computed-vs-declared validation (HectorManager.java:451-475;
    Verifier.java:288-333): returns (ok_rows, error_channel). The error
    channel mirrors the reference's log-and-continue discipline — bad
    rows are side-output, never dropped silently."""
    # null-safe: a NULL computed or declared value is a FAILURE, not a
    # silent drop (a bare == yields NULL, and both where(_ok) and
    # where(~_ok) filter NULL rows out of existence). false AND NULL
    # = false in SQL 3VL, so the conjunction below is never NULL.
    checked = df.withColumn(
        "_ok",
        computed.isNotNull()
        & F.col(declared_col).isNotNull()
        & (computed == F.col(declared_col)),
    )
    ok = checked.where(F.col("_ok")).drop("_ok")
    errors = checked.where(~F.col("_ok")).drop("_ok")
    return ok, errors
