"""Deterministic raster tile assignment (north-rule raster↔vector op).

``tile = mix(cell_at_zoom) mod n_tiles`` — a pure Catalyst expression
(functions.tile_sql_expr): no UDF, no RNG, no partition-order
dependence, so the same input always produces the same tile on any
cluster size (the determinism requirement in SURVEY.md §4.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import h3_cell, tile_id
from ..geo import h3lite as H


def assign_tiles(
    points: DataFrame,
    zoom_res: int = 5,
    n_tiles: int = 4096,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str | None = None,
    out_col: str = "tile_id",
) -> DataFrame:
    """Add a deterministic ``tile_id`` column.

    If the frame already carries a finer cell id, the zoom cell derives
    from it arithmetically (aperture-4 parent = two bit-shifts) without
    touching lon/lat again.
    """
    if cell_col is not None:
        # parent-derivation in pure SQL: x>>s, y>>s re-packed
        df = points.withColumn("__zoom_cell", _parent_expr(cell_col, zoom_res))
    else:
        df = points.withColumn("__zoom_cell", h3_cell(lon_col, lat_col, zoom_res))
    return df.withColumn(out_col, tile_id("__zoom_cell", n_tiles)).drop("__zoom_cell")


def _parent_expr(cell_col: str, parent_res: int):
    return F.expr(parent_sql_expr(cell_col, parent_res, dialect="spark"))


def parent_sql_expr(cell_col: str, parent_res: int, dialect: str = "spark") -> str:
    """cell_to_parent as SQL (Spark + DuckDB): unpack res/x/y with exact
    integer division, right-shift x and y by (res - parent_res), repack.
    Aperture-4 ⇒ parent index = child index halved per res step."""
    from ..functions import _IDIV

    idiv = _IDIV[dialect]
    c = f"cast({cell_col} as bigint)"
    res = f"({c} {idiv} {1 << 56})"
    x = f"(({c} {idiv} {1 << 28}) % {1 << 28})"
    y = f"({c} % {1 << 28})"
    p2 = f"cast(pow(cast(2 as double), cast({res} - {parent_res} as double)) as bigint)"
    return (
        f"(cast({parent_res} as bigint) * {1 << 56}"
        f" + ({x} {idiv} {p2}) * {1 << 28} + ({y} {idiv} {p2}))"
    )


# ---------------------------------------------------------------------------
# raster ↔ vector (north rule): both directions as pure column
# expressions — the raster IS the relational (cell, value) grid (the
# natural distributed representation; a dense 2-D array is just its
# pivot, materializable per bounded patch on the driver).
# ---------------------------------------------------------------------------


def rasterize(
    points: DataFrame,
    res: int,
    value_agg=None,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Vector → raster: bin points into the res-grid, one row per
    non-empty cell. ``value_agg`` defaults to count; pass e.g.
    F.avg("price") for a value raster. Sparse by construction — empty
    cells carry no rows (at 10^12 points the dense grid never
    materializes anywhere)."""
    agg = value_agg if value_agg is not None else F.count(F.lit(1)).alias("value")
    return (
        points.withColumn("cell", h3_cell(lon_col, lat_col, res))
        .groupBy("cell")
        .agg(agg)
    )


def cell_bounds_sql(cell_col: str, dialect: str = "spark") -> dict[str, str]:
    """Cell rectangle corner expressions (the SQL twin of
    h3lite.cell_to_boundary) — integer unpack + float arithmetic."""
    from ..functions import _IDIV

    idiv = _IDIV[dialect]
    c = f"cast({cell_col} as bigint)"
    res = f"({c} {idiv} {1 << 56})"
    x = f"(({c} {idiv} {1 << 28}) % {1 << 28})"
    y = f"({c} % {1 << 28})"
    nx = f"cast(pow(cast(2 as double), cast({res} + 2 as double)) as double)"
    ny = f"cast(pow(cast(2 as double), cast({res} + 1 as double)) as double)"
    return {
        "lon_min": f"(cast({x} as double) / {nx} * 360.0 - 180.0)",
        "lat_min": f"(cast({y} as double) / {ny} * 180.0 - 90.0)",
        "lon_max": f"((cast({x} as double) + 1.0) / {nx} * 360.0 - 180.0)",
        "lat_max": f"((cast({y} as double) + 1.0) / {ny} * 180.0 - 90.0)",
    }


def vectorize(
    raster: DataFrame,
    threshold: float,
    cell_col: str = "cell",
    value_col: str = "value",
) -> DataFrame:
    """Raster → vector: cells with value ≥ threshold become polygon
    features — one closed CCW quad ring per cell, as
    array<struct<lon,lat>> (the engine's polygon wire format, §1.2).
    Adjacent-cell dissolve is a follow-up groupBy on parent cells;
    per-cell quads keep the operator a pure projection."""
    b = cell_bounds_sql(cell_col, "spark")
    ring = (
        "array("
        f"struct({b['lon_min']} as lon, {b['lat_min']} as lat),"
        f"struct({b['lon_max']} as lon, {b['lat_min']} as lat),"
        f"struct({b['lon_max']} as lon, {b['lat_max']} as lat),"
        f"struct({b['lon_min']} as lon, {b['lat_max']} as lat),"
        f"struct({b['lon_min']} as lon, {b['lat_min']} as lat))"
    )
    return (
        raster.where(F.col(value_col) >= threshold)
        .withColumn("ring", F.expr(ring))
        .select(F.col(cell_col).alias("poly_cell"), F.col(value_col).alias("value"), "ring")
    )


def mosaic_best(
    points: DataFrame,
    score_col: str,
    id_col: str = "image_id",
    zoom_res: int = 5,
    n_tiles: int = 4096,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str | None = None,
    tile_col: str = "tile_id",
) -> DataFrame:
    """One representative row per raster tile: the DETERMINISTIC argmax
    of ``score_col`` (ties broken by minimum ``id_col``) — the
    pick-a-thumbnail-per-map-tile step of a tile-rendering pipeline,
    and the spatial form of the dedup keep-one-canonical discipline.

    Scale shape: for numeric ids the argmax is ``max(struct(score,
    -id, payload…))`` — an ordinary aggregate, so Catalyst runs
    map-side partial aggregation and the single exchange carries one
    row per (tile, task), never the input rows, and nothing is sorted.
    A ``row_number`` window would instead shuffle EVERY row and sort
    each tile's partition — at 10^12 images with hot-spot tiles that
    is both the bigger shuffle and a skew hazard (one reducer owns the
    hottest tile's full row set). Struct comparison is field-order
    lexicographic, so (score, -id) is total and unique per row; the
    payload fields after it never decide the max but ride along, which
    is what makes this argmax rather than plain max. Non-numeric ids
    fall back to the window plan (same result, tested equal).

    Returns one row per tile: ``tile_col``, ``id_col``, ``score_col``
    + the remaining point columns.
    """
    from pyspark.sql.types import NumericType

    tiled = assign_tiles(
        points,
        zoom_res=zoom_res,
        n_tiles=n_tiles,
        lon_col=lon_col,
        lat_col=lat_col,
        cell_col=cell_col,
        out_col=tile_col,
    )
    payload = [c for c in points.columns if c not in (score_col, id_col)]
    id_numeric = isinstance(points.schema[id_col].dataType, NumericType)
    if id_numeric:
        packed = F.struct(
            F.col(score_col).alias("s"),
            (-F.col(id_col)).alias("neg_id"),
            *[F.col(c).alias(c) for c in payload],
        )
        best = tiled.groupBy(tile_col).agg(F.max(packed).alias("b"))
        return best.select(
            tile_col,
            (-F.col("b.neg_id")).cast(points.schema[id_col].dataType).alias(id_col),
            F.col("b.s").alias(score_col),
            *[F.col(f"b.{c}").alias(c) for c in payload],
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy(tile_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        tiled.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(tile_col, id_col, score_col, *payload)
    )


def raster_patch(raster: DataFrame, lon0: float, lat0: float, lon1: float, lat1: float, res: int):
    """Materialize a BOUNDED bbox of the sparse raster as a dense 2-D
    numpy array (driver-side; the bbox caps the size — this is the
    render/export step, not a distributed op)."""
    import numpy as np

    from ..geo import h3lite as HH

    cells = HH.cover_bbox(lon0, lat0, lon1, lat1, res)
    xs, ys = HH.cell_xy(cells)
    x_min, x_max = int(xs.min()), int(xs.max())
    y_min, y_max = int(ys.min()), int(ys.max())
    rows = (
        raster.where(F.col("cell").isin([int(c) for c in cells]))
        .select("cell", "value")
        .collect()
    )
    grid = np.zeros((y_max - y_min + 1, x_max - x_min + 1), dtype=np.float64)
    for r in rows:
        cx, cy = HH.cell_xy(np.int64(r.cell))
        grid[int(cy) - y_min, int(cx) - x_min] = float(r.value)
    return grid
