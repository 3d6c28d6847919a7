"""Hot-key salting: explicit skew-defeating repartition + two-stage agg
(north_star: "explicit salted repartitioning to defeat hot-cell skew").

H3 cells over real data follow power-law density (cities). A
`repartition(N, cell)` sends every row of a hot cell to ONE task —
straggler. The cure is a salt column that splits hot keys across S
sub-partitions; aggregation then runs in two stages (partial per
(key, salt), final per key). AQE's skew-join handling
(spark.sql.adaptive.skewJoin, enabled in session.py) is the runtime
backstop; this module is the *planned* version driven by a cheap
histogram pre-pass — the same economics as the reference's MD5-mod-N
hash-space sharding (Util.java:86-103, Ingester.java:303-319), which
is static salting of the pairtree keyspace.

Determinism: the salt is ``pmod(xxhash64(row_key), S)`` — a pure
function of row content, never round-robin/RNG, so any cluster size
and any retry produces identical partitions and (after the final
stage) identical results. Two-stage aggregation is restricted to
algebraic aggregates plus collect-style aggregates with a final
deterministic sort.

Scale notes: the histogram pre-pass is one narrow scan + a tiny agg
(#distinct cells ≪ #rows); at 10^12 rows it runs on a sampled
fraction (``sample_fraction``) — hot-cell detection needs only heavy
hitters, which sampling preserves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_histogram(
    df: DataFrame, key_col: str, sample_fraction: float | None = None
) -> DataFrame:
    """(key, n) ESTIMATED counts — the pre-pass that sizes per-key
    salt. Sampled counts are scaled back by 1/fraction so the salt
    plan sees true magnitudes (an unscaled sample would silently
    disable salting for every hot key)."""
    if sample_fraction:
        return (
            df.sample(sample_fraction, seed=42)
            .groupBy(key_col)
            .agg(
                F.ceil(F.count(F.lit(1)) / F.lit(sample_fraction)).cast("long").alias("n")
            )
        )
    return df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))


def salt_plan(
    hist: DataFrame, key_col: str, rows_per_task: int, max_salt: int = 256
) -> DataFrame:
    """(key, n_salt): how many ways to split each key. Keys under
    ``rows_per_task`` get n_salt=1 (no shuffle inflation for the cold
    tail — only hot keys pay)."""
    return hist.select(
        key_col,
        F.least(
            F.greatest(F.ceil(F.col("n") / rows_per_task).cast("int"), F.lit(1)),
            F.lit(max_salt),
        ).alias("n_salt"),
    )


def salted(
    df: DataFrame,
    key_col: str,
    plan: DataFrame,
    salt_src: str | Column,
) -> DataFrame:
    """Attach a deterministic ``_salt`` column: pmod(xxhash64(salt_src),
    n_salt(key)). ``plan`` is broadcast — one map-side lookup, no
    shuffle."""
    src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    return df.join(F.broadcast(plan), key_col, "left").withColumn(
        "_salt", F.pmod(F.xxhash64(src), F.coalesce(F.col("n_salt"), F.lit(1)))
    )


def salted_repartition(
    df: DataFrame,
    key_col: str,
    salt_src: str | Column,
    rows_per_task: int = 1_000_000,
    num_partitions: int | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """repartition(key, salt) with histogram-derived per-key salt —
    the north-star "explicit salted repartitioning"."""
    plan = salt_plan(key_histogram(df, key_col, sample_fraction), key_col, rows_per_task)
    out = salted(df, key_col, plan, salt_src)
    if num_partitions:
        return out.repartition(num_partitions, F.col(key_col), F.col("_salt"))
    return out.repartition(F.col(key_col), F.col("_salt"))


def salted_collect_sorted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_src: str | Column,
    rows_per_task: int = 100_000,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Two-stage skew-proof collect: stage 1 collects per (key, salt)
    partial lists; stage 2 flattens + sorts per key. Result equals
    ``groupBy(key).agg(sort_array(collect_list(value)))`` exactly (the
    final sort restores a total order, so partitioning can't leak into
    the output) — the A2 reverse-index shape (HectorManager.java:
    576-589) made hot-key safe."""
    plan = salt_plan(key_histogram(df, key_col, sample_fraction), key_col, rows_per_task)
    stage1 = (
        salted(df, key_col, plan, salt_src)
        .groupBy(key_col, "_salt")
        .agg(F.collect_list(value_col).alias("_part"))
    )
    return stage1.groupBy(key_col).agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias("values")
    )
