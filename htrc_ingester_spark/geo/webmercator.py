"""Web-Mercator XYZ tiles + Bing quadkeys — the slippy-map standard.

Completes the spatial-index family (h3lite aperture-4, s2lite cube
faces, geohash base32) with the projection every web map serves from:
``tile_x = floor((lon+180)/360 · 2^z)``,
``tile_y = floor((1 − asinh(tan φ)/π)/2 · 2^z)`` with latitude clamped
to ±85.05112878° (the square-world cutoff), and the quadkey string
interleaving the tile bits most-significant-first (one base-4 digit
per zoom level — prefix = parent tile, the property range scans use).

All column expressions (no UDF): the trig runs once per row inside
whole-stage codegen, the quadkey digits are integer bit tests. The SQL
builder emits the same formula for Spark SQL and DuckDB; the only
float-boundary risk is a coordinate within ~1 ulp of a tile edge
(documented, same caveat as s2lite's s2_sql_expr).

Reference parity: none (north-rule extension); the id↔path projection
discipline mirrors the reference's pairtree encode (SURVEY.md §2 F5).
"""

from __future__ import annotations

import numpy as np

MAX_LAT = 85.05112878
MAX_ZOOM = 23  # 2*23 bits interleaved stays far inside int64


def tile_xy(lon, lat, zoom: int):
    """Vectorized numpy reference: (tile_x, tile_y) at ``zoom``."""
    if not (0 <= zoom <= MAX_ZOOM):
        raise ValueError("zoom outside [0, 23]")
    n = 1 << zoom
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    rad = np.deg2rad(lat)
    yf = (1.0 - np.arcsinh(np.tan(rad)) / np.pi) / 2.0
    y = np.clip((yf * n).astype(np.int64), 0, n - 1)
    return x, y


def quadkey(lon, lat, zoom: int):
    """Vectorized numpy reference: quadkey strings at ``zoom``."""
    x, y = tile_xy(lon, lat, zoom)
    x, y = np.atleast_1d(x), np.atleast_1d(y)
    out = []
    for xi, yi in zip(x, y):
        digits = []
        for i in range(zoom, 0, -1):
            mask = 1 << (i - 1)
            digits.append(str((1 if xi & mask else 0) + (2 if yi & mask else 0)))
        out.append("".join(digits))
    return np.array(out, dtype=object)


def _tile_sql(lon_col: str, lat_col: str, zoom: int) -> tuple[str, str]:
    """(tile_x, tile_y) SQL fragments, identical in Spark and DuckDB
    (ln/tan/pi/radians are ANSI in both; asinh spelled as
    ln(t + sqrt(t²+1)) since Spark SQL lacks asinh)."""
    n = 1 << zoom
    clamp_lat = (
        f"least(greatest(cast({lat_col} as double),"
        f" cast('-{MAX_LAT!r}' as double)), cast('{MAX_LAT!r}' as double))"
    )
    t = f"tan(radians({clamp_lat}))"
    asinh = f"ln({t} + sqrt({t} * {t} + 1.0))"
    x = (
        f"least(greatest(cast(floor((cast({lon_col} as double) + 180.0) / 360.0 * {n})"
        f" as bigint), cast(0 as bigint)), cast({n - 1} as bigint))"
    )
    y = (
        f"least(greatest(cast(floor((1.0 - {asinh} / pi()) / 2.0 * {n})"
        f" as bigint), cast(0 as bigint)), cast({n - 1} as bigint))"
    )
    return x, y


def quadkey_sql_expr(lon_col: str, lat_col: str, zoom: int, dialect: str = "spark") -> str:
    """Quadkey string as portable SQL: one base-4 digit per level from
    integer bit tests on the tile indices."""
    if not (1 <= zoom <= MAX_ZOOM):
        raise ValueError("zoom outside [1, 23]")
    idiv = "div" if dialect == "spark" else "//"
    x, y = _tile_sql(lon_col, lat_col, zoom)
    digits = []
    for i in range(zoom, 0, -1):
        m = 1 << (i - 1)
        d = f"(((({x}) {idiv} {m}) % 2) + 2 * ((({y}) {idiv} {m}) % 2))"
        digits.append(f"cast({d} as varchar)" if dialect == "duckdb" else f"cast({d} as string)")
    return "concat(" + ", ".join(digits) + ")"
