"""Segment-segment intersection join (ST_Intersects on linestrings).

Completes the vector-join family (pip_join: point⋈polygon, bbox_join:
rect⋈rect, map_match: point⋈nearest-segment) with line⋈line: all pairs
of segments from two tables that touch or cross — road-network overlay,
trajectory/boundary crossing detection, cadastral conflict checks.
Reference parity: HTRC-Ingester has no spatial ops (north-rule
extension); the relational discipline mirrors its validation equi-joins
(SURVEY.md §2 J5) lifted to a spatial key.

Plan shape (Spark-first, same skeleton as bbox_join):

1. Each segment's bounding box explodes to covering grid cells
   (Catalyst ``sequence`` generators, no UDF).
2. ONE equi-join on ``cell``.
3. The exact intersection predicate — four cross-product orientation
   tests plus collinear-overlap bbox checks, all plain column
   arithmetic inside whole-stage codegen — keeps true pairs.
4. REFERENCE-POINT dedup, no ``distinct``: a pair is emitted only from
   the cell containing the min corner of the two segments' bbox
   intersection (that corner is inside both covers whenever the
   segments intersect, so each true pair survives exactly once).

Semantics: TRUE iff the closed segments share at least one point —
proper crossings, endpoint touches, and collinear overlaps all count.
The orientation tests are IEEE-double sign comparisons, bit-identical
across Spark and DuckDB when coordinates are exactly representable
(the catalog fixture uses /16 grid fractions for that reason); at the
~1-ulp degenerate boundary the kernel is still deterministic per
engine.

Scale: one cell equi-join exchange (AQE skew-handled); fan-out bounded
by cells-per-segment-bbox via the shared auto_res. Long diagonal
segments cover their full bbox (a cover superset — correctness is
untouched, the exact predicate rejects non-hits; callers with
continent-spanning lines should split them upstream, same guidance as
bbox_join's antimeridian note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .bbox_join import _cover, _x_idx, _y_idx, auto_res

_SEG_COLS = ("x0", "y0", "x1", "y1")


def _ccw(ax, ay, bx, by, cx, cy) -> Column:
    """Twice the signed area of triangle (a, b, c)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_bbox(px, py, ax, ay, bx, by) -> Column:
    """Point within the closed bbox of segment (a, b) — the collinear
    companion to a zero orientation test."""
    return (
        (px >= F.least(ax, bx))
        & (px <= F.greatest(ax, bx))
        & (py >= F.least(ay, by))
        & (py <= F.greatest(ay, by))
    )


def segments_intersect_cond(pa: str = "a_", pb: str = "b_") -> Column:
    """Closed-segment intersection predicate over prefixed endpoint
    columns ``{pa}x0..{pa}y1`` and ``{pb}x0..{pb}y1``."""
    ax, ay = F.col(f"{pa}x0"), F.col(f"{pa}y0")
    bx, by = F.col(f"{pa}x1"), F.col(f"{pa}y1")
    cx, cy = F.col(f"{pb}x0"), F.col(f"{pb}y0")
    dx, dy = F.col(f"{pb}x1"), F.col(f"{pb}y1")
    d1 = _ccw(cx, cy, dx, dy, ax, ay)
    d2 = _ccw(cx, cy, dx, dy, bx, by)
    d3 = _ccw(ax, ay, bx, by, cx, cy)
    d4 = _ccw(ax, ay, bx, by, dx, dy)
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    touch = (
        ((d1 == 0) & _on_bbox(ax, ay, cx, cy, dx, dy))
        | ((d2 == 0) & _on_bbox(bx, by, cx, cy, dx, dy))
        | ((d3 == 0) & _on_bbox(cx, cy, ax, ay, bx, by))
        | ((d4 == 0) & _on_bbox(dx, dy, ax, ay, bx, by))
    )
    return proper | touch


def segments_intersect_sql(pa: str, pb: str) -> str:
    """The same predicate as portable SQL (Spark SQL and DuckDB) for
    the driver's oracle; ``pa``/``pb`` are column prefixes."""
    ax, ay, bx, by = f"{pa}x0", f"{pa}y0", f"{pa}x1", f"{pa}y1"
    cx, cy, dx, dy = f"{pb}x0", f"{pb}y0", f"{pb}x1", f"{pb}y1"

    def ccw(o1x, o1y, o2x, o2y, px, py):
        return (
            f"(({o2x} - {o1x}) * ({py} - {o1y}) - ({o2y} - {o1y}) * ({px} - {o1x}))"
        )

    def onb(px, py, sx0, sy0, sx1, sy1):
        # case-when min/max instead of least/greatest: DuckDB 1.x hits
        # an internal "flat vector" assertion on least() over joined
        # CTE columns; case is equivalent and safe in both engines
        lo = lambda u, v: f"(case when {u} <= {v} then {u} else {v} end)"
        hi = lambda u, v: f"(case when {u} <= {v} then {v} else {u} end)"
        return (
            f"({px} >= {lo(sx0, sx1)} and {px} <= {hi(sx0, sx1)}"
            f" and {py} >= {lo(sy0, sy1)} and {py} <= {hi(sy0, sy1)})"
        )

    d1 = ccw(cx, cy, dx, dy, ax, ay)
    d2 = ccw(cx, cy, dx, dy, bx, by)
    d3 = ccw(ax, ay, bx, by, cx, cy)
    d4 = ccw(ax, ay, bx, by, dx, dy)
    proper = (
        f"((({d1} > 0 and {d2} < 0) or ({d1} < 0 and {d2} > 0))"
        f" and (({d3} > 0 and {d4} < 0) or ({d3} < 0 and {d4} > 0)))"
    )
    touch = (
        f"(({d1} = 0 and {onb(ax, ay, cx, cy, dx, dy)})"
        f" or ({d2} = 0 and {onb(bx, by, cx, cy, dx, dy)})"
        f" or ({d3} = 0 and {onb(cx, cy, ax, ay, bx, by)})"
        f" or ({d4} = 0 and {onb(dx, dy, ax, ay, bx, by)}))"
    )
    return f"({proper} or {touch})"


def _with_bbox(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("lon_min", F.least("x0", "x1"))
        .withColumn("lon_max", F.greatest("x0", "x1"))
        .withColumn("lat_min", F.least("y0", "y1"))
        .withColumn("lat_max", F.greatest("y0", "y1"))
    )


def segment_intersect_join(
    spark: SparkSession,
    a: DataFrame,
    b: DataFrame,
    res: int | None = None,
) -> DataFrame:
    """All pairs of intersecting segments between ``a`` and ``b``.

    Inputs carry endpoint columns ``x0, y0, x1, y1`` plus id/payload
    columns; output carries ``a``'s columns prefixed ``a_`` and ``b``'s
    prefixed ``b_`` (bbox helper columns dropped).
    """
    a_box, b_box = _with_bbox(a), _with_bbox(b)
    if res is None:
        res = auto_res(a_box, b_box)
    ca = _cover(a_box, res, "a_")
    cb = _cover(b_box, res, "b_")
    j = ca.join(cb, "cell")
    rx = F.greatest(F.col("a_lon_min"), F.col("b_lon_min"))
    ry = F.greatest(F.col("a_lat_min"), F.col("b_lat_min"))
    ref_cell = (
        F.lit(res).cast("long") * F.lit(1 << 56)
        + _x_idx(rx, res) * F.lit(1 << 28)
        + _y_idx(ry, res)
    )
    bbox_overlap = (
        (F.col("a_lon_min") <= F.col("b_lon_max"))
        & (F.col("b_lon_min") <= F.col("a_lon_max"))
        & (F.col("a_lat_min") <= F.col("b_lat_max"))
        & (F.col("b_lat_min") <= F.col("a_lat_max"))
    )
    out = j.where(
        bbox_overlap & (F.col("cell") == ref_cell) & segments_intersect_cond()
    ).drop("cell")
    helper = [f"{p}{c}" for p in ("a_", "b_") for c in ("lon_min", "lon_max", "lat_min", "lat_max")]
    return out.drop(*helper)
