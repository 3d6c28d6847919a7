"""Trajectory analytics over geotagged point sequences (GPS tracks,
camera-trap uploads, per-device image streams): time-gap segmentation
and per-track movement statistics.

The standard moving-objects toolkit (leg distance / speed via
consecutive-point pairing, gap-based track splitting, per-track
rollups) expressed Spark-first: consecutive pairing is ``lag`` over ONE
entity-keyed window, segmentation is a running sum of gap flags over
the SAME window, and the rollup is a ``groupBy`` on the same key — so
Catalyst plans a single exchange for the whole operator (the window's
hash partitioning satisfies the aggregate's distribution; pinned by
test_trajectory.test_plan_single_exchange). At 10^12 points the only
shuffle is one hash exchange on the entity key; per-entity skew is
bounded because window state is a running scan, not a materialized
buffer.

Everything is built-in expression work (lag / sum-over-window /
haversine as sin-cos SQL) — no UDFs — and the same formulas are valid
DuckDB SQL, which is what the ``trajectory_stats_entities`` catalog
oracle runs.

Reference analog: the per-volume ordered page-sequence analytics
(SURVEY.md §2.5 W1-W3 — rank within volume, ordered lists, sequence
gap checks) applied to the north-rule geospatial axis: the "volume" is
the moving entity, the "page order" is event time, and the gap check
becomes time-gap track segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import haversine_m


def trajectory_stats(
    points: DataFrame,
    id_col: str = "entity_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    gap_s: float | None = None,
) -> DataFrame:
    """Per-track movement statistics.

    Orders each entity's points by ``ts_col`` (numeric seconds or
    timestamp — cast to double epoch internally; ties broken by the
    pair (ts, lon, lat) being unique is the caller's contract for
    deterministic output), pairs consecutive points with ``lag``, and
    aggregates:

    - ``n_points`` — points in the track (segment)
    - ``duration_s`` — last ts − first ts
    - ``total_m`` — summed haversine leg length
    - ``max_leg_m`` — longest single leg
    - ``avg_speed_mps`` — total_m / duration_s (null for single-point
      or zero-duration tracks)

    With ``gap_s`` set, a leg longer than ``gap_s`` seconds SPLITS the
    track: output gains a ``segment`` column (0-based per entity) and
    one row per (entity, segment); the bridging leg contributes to
    neither segment — the same semantics as sessionization's gap rule,
    applied to movement data.
    """
    w = Window.partitionBy(id_col).orderBy(ts_col)
    t = F.col(ts_col).cast("double")
    legs = (
        points.select(id_col, ts_col, lon_col, lat_col)
        .withColumn("__t", t)
        .withColumn("__dt", t - F.lag(t).over(w))
        .withColumn("__plat", F.lag(lat_col).over(w))
        .withColumn("__plon", F.lag(lon_col).over(w))
    )
    leg_m = F.when(
        F.col("__plat").isNotNull(), haversine_m("__plat", "__plon", lat_col, lon_col)
    )
    keys = [id_col]
    if gap_s is not None:
        # a leg spanning more than gap_s breaks the track; the running
        # count of breaks IS the segment index (same window — no
        # second exchange)
        brk = F.when(F.col("__dt") > float(gap_s), 1).otherwise(0)
        legs = legs.withColumn("__brk", brk).withColumn(
            "segment", F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        leg_m = F.when(F.col("__brk") == 0, leg_m)
        keys.append("segment")
    legs = legs.withColumn("__leg_m", leg_m)
    out = legs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.max("__t") - F.min("__t")).alias("duration_s"),
        F.coalesce(F.sum("__leg_m"), F.lit(0.0)).alias("total_m"),
        F.max("__leg_m").alias("max_leg_m"),
    )
    return out.withColumn(
        "avg_speed_mps",
        F.when(F.col("duration_s") > 0, F.col("total_m") / F.col("duration_s")),
    )


def trajectory_legs(
    points: DataFrame,
    id_col: str = "entity_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-leg view of the same pairing :func:`trajectory_stats`
    aggregates: one row per consecutive point pair —
    (entity_id, t0, t1, leg_m, dt_s, speed_mps). The batch twin of
    :func:`htrc_ingester_spark.streaming.incremental.trajectory_legs_stream`
    (their outputs are asserted equal in test_streaming)."""
    w = Window.partitionBy(id_col).orderBy(ts_col)
    t = F.col(ts_col).cast("double")
    legs = (
        points.select(id_col, ts_col, lon_col, lat_col)
        .withColumn("__t", t)
        .withColumn("__pt", F.lag(t).over(w))
        .withColumn("__plat", F.lag(lat_col).over(w))
        .withColumn("__plon", F.lag(lon_col).over(w))
        .where(F.col("__pt").isNotNull())
    )
    return legs.select(
        F.col(id_col).cast("string").alias("entity_id"),
        F.col("__pt").alias("t0"),
        F.col("__t").alias("t1"),
        haversine_m("__plat", "__plon", lat_col, lon_col).alias("leg_m"),
        (F.col("__t") - F.col("__pt")).alias("dt_s"),
        F.when(
            F.col("__t") > F.col("__pt"),
            haversine_m("__plat", "__plon", lat_col, lon_col)
            / (F.col("__t") - F.col("__pt")),
        ).alias("speed_mps"),
    )


def geofence_transitions(
    spark,
    points: DataFrame,
    polys: list[dict],
    id_col: str = "entity_id",
    ts_col: str = "ts",
    key_col: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 7,
) -> DataFrame:
    """Enter/exit/switch events of moving entities against a zone set.

    Labels every point with its containing zone via pip_join (points
    outside every zone get a NULL label; a point inside several
    overlapping zones takes the lexicographically smallest poly_id so
    the timeline is deterministic), then walks each entity's timeline
    once: a row is emitted whenever the label changes, carrying
    ``from_zone`` / ``to_zone`` / ``kind`` (enter | exit | switch). An
    entity's first point emits an ``enter`` iff it starts inside a
    zone. ``key_col`` must uniquely identify a point row (it anchors
    the label join-back).

    Shuffle shape: pip_join's broadcast cover probe (no point
    exchange), ONE hash exchange to join labels back on ``key_col``,
    and ONE entity-keyed window exchange for the lag — bounded and
    independent of zone count. The streaming twin is pip_join per
    micro-batch (streaming/geofence) + this lag over
    applyInPandasWithState; batch==stream on the same input is pinned
    in tests.
    """
    from .pip_join import pip_join

    labels = (
        pip_join(spark, points.select(key_col, lon_col, lat_col), polys, res=res)
        .groupBy(key_col)
        .agg(F.min("poly_id").alias("__zone"))
    )
    timeline = points.join(labels, key_col, "left")
    w = Window.partitionBy(id_col).orderBy(ts_col, key_col)
    prev = F.lag("__zone").over(w)
    first = F.row_number().over(w) == 1
    return (
        timeline.withColumn("__prev", prev)
        .withColumn("__first", first)
        .where(
            (F.col("__first") & F.col("__zone").isNotNull())
            | (~F.col("__first") & ~F.col("__zone").eqNullSafe(F.col("__prev")))
        )
        .select(
            id_col,
            ts_col,
            F.col("__prev").alias("from_zone"),
            F.col("__zone").alias("to_zone"),
            F.when(F.col("__zone").isNull(), F.lit("exit"))
            .when(F.col("__prev").isNull(), F.lit("enter"))
            .otherwise(F.lit("switch"))
            .alias("kind"),
        )
    )


def trajectory_resample(
    points: DataFrame,
    dt: float,
    id_col: str = "entity_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_gap_s: float | None = None,
) -> DataFrame:
    """Resample each entity's track to a regular time grid: one output
    row per tick ``k·dt`` falling in a leg's half-open span
    ``[t_i, t_{i+1})``, position linearly interpolated along the leg.
    The standard fixed-rate regularizer upstream of movement models
    (uniform sequences from irregular GPS fixes).

    ``max_gap_s``: legs longer than this are NOT interpolated across
    (sensor outage ≠ straight-line motion — the same gap philosophy as
    trajectory_stats); their span emits nothing.

    Shuffle shape: ONE entity-keyed window exchange (the lead pairing);
    tick generation is a ``sequence`` explode — a Catalyst generator,
    so output rows never pass through Python and the fan-out is
    (leg duration / dt), bounded by ``max_gap_s`` when set. Use a power
    -of-two ``dt`` for bit-exact tick arithmetic across engines.

    Returns (id, tick_ts, lon, lat) sorted ticks per entity.
    """
    w = Window.partitionBy(id_col).orderBy(ts_col)
    legs = (
        points.select(id_col, ts_col, lon_col, lat_col)
        .withColumn("__t1", F.lead(ts_col).over(w))
        .withColumn("__lon1", F.lead(lon_col).over(w))
        .withColumn("__lat1", F.lead(lat_col).over(w))
        .where(F.col("__t1").isNotNull())
    )
    if max_gap_s is not None:
        legs = legs.where(F.col("__t1") - F.col(ts_col) <= F.lit(max_gap_s))
    t0, t1 = F.col(ts_col), F.col("__t1")
    k0 = F.ceil(t0 / F.lit(dt)).cast("long")
    # last tick strictly below t1: ceil(t1/dt) - 1 handles both exact
    # and non-exact t1 (half-open span)
    k1 = (F.ceil(t1 / F.lit(dt)).cast("long") - F.lit(1)).cast("long")
    ticks = legs.withColumn("__k0", k0).withColumn("__k1", k1).where(
        F.col("__k0") <= F.col("__k1")
    ).withColumn("__k", F.explode(F.expr("sequence(__k0, __k1)")))
    tick_t = F.col("__k").cast("double") * F.lit(dt)
    frac = (tick_t - t0) / (t1 - t0)
    return ticks.select(
        id_col,
        tick_t.alias("tick_ts"),
        (F.col(lon_col) + frac * (F.col("__lon1") - F.col(lon_col))).alias("lon"),
        (F.col(lat_col) + frac * (F.col("__lat1") - F.col(lat_col))).alias("lat"),
    )


def trajectory_od(
    points: DataFrame,
    res: int,
    id_col: str = "entity_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    gap_s: float | None = None,
) -> DataFrame:
    """Origin-destination matrix: one (o_cell, d_cell, n) row per pair
    of grid cells, counting track segments that START in o_cell and
    END in d_cell — the flow summary behind commute maps and transfer
    matrices.

    Same single entity-window as trajectory_stats (gap rule included),
    then per-(entity, segment) endpoint extraction via min/max over
    struct(t, lon, lat) — an ordinary aggregate with map-side combine
    (deterministic: ts unique per entity is the module contract), and
    one final (o_cell, d_cell) count. Single-point segments emit their
    self-pair (o == d), preserving Σn == number of segments.
    """
    from ..geo import h3lite as H

    w = Window.partitionBy(id_col).orderBy(ts_col)
    t = F.col(ts_col).cast("double")
    df = points.select(id_col, ts_col, lon_col, lat_col).withColumn("__t", t)
    keys = [id_col]
    if gap_s is not None:
        dt = t - F.lag(t).over(w)
        brk = F.when(dt > float(gap_s), 1).otherwise(0)
        df = df.withColumn(
            "segment",
            F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        keys.append("segment")
    ends = df.groupBy(*keys).agg(
        F.min(F.struct("__t", F.col(lon_col).alias("lon"), F.col(lat_col).alias("lat"))).alias("o"),
        F.max(F.struct("__t", F.col(lon_col).alias("lon"), F.col(lat_col).alias("lat"))).alias("d"),
    )
    o_cell = F.expr(H.h3_sql_expr("o.lon", "o.lat", res))
    d_cell = F.expr(H.h3_sql_expr("d.lon", "d.lat", res))
    return (
        ends.select(o_cell.alias("o_cell"), d_cell.alias("d_cell"))
        .groupBy("o_cell", "d_cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
