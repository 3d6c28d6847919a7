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
