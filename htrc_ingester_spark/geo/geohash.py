"""Geohash encode — the third standard spatial index family next to
geo/h3lite and geo/s2lite (public algorithm: interleave lon/lat
binary-search bits MSB-first starting with lon, emit base-32 chars).

Same discipline as the other two: ONE construction expressed three
ways — numpy (tests), Spark SQL, DuckDB SQL — bit-identical, so the
driver's oracle value-checks the real encode. Closed form, no loops:
for precision p there are 5p bits, ceil(5p/2) of longitude and
floor(5p/2) of latitude; the lon/lat integers are single floor()
expressions and every output char is an unrolled 5-bit extract.

Wikipedia's worked example pins the vectors (57.64911, 10.40744 →
"u4pruyd..."), asserted in tests/test_geo.py.
"""

from __future__ import annotations

import numpy as np

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"  # excludes a, i, l, o


def _bit_counts(precision: int) -> tuple[int, int]:
    total = 5 * precision
    return (total + 1) // 2, total // 2  # lon bits, lat bits


def encode(lat, lon, precision: int = 6):
    """Vectorized numpy geohash encode → array of strings. All bit
    extraction and char-value assembly is whole-array (5·precision bit
    ops total); only the final per-row string join is Python."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    nlon, nlat = _bit_counts(precision)
    li = np.clip(
        np.floor((lon + 180.0) / 360.0 * (1 << nlon)).astype(np.int64), 0, (1 << nlon) - 1
    )
    la = np.clip(
        np.floor((lat + 90.0) / 180.0 * (1 << nlat)).astype(np.int64), 0, (1 << nlat) - 1
    )
    flat_li, flat_la = li.ravel(), la.ravel()
    vals = np.zeros((precision, flat_li.shape[0]), dtype=np.int64)
    for c in range(precision):
        for b in range(5):
            j = 5 * c + b  # interleaved stream position, MSB first
            if j % 2 == 0:
                bit = (flat_li >> (nlon - 1 - j // 2)) & 1
            else:
                bit = (flat_la >> (nlat - 1 - (j - 1) // 2)) & 1
            vals[c] = (vals[c] << 1) | bit
    alphabet = np.array(list(_B32))
    chars = alphabet[vals]  # (precision, n) of 1-char strings
    joined = chars[0]
    for c in range(1, precision):
        joined = np.char.add(joined, chars[c])
    out = np.empty(lat.shape, dtype=object)
    out.ravel()[:] = joined
    return out


def geohash_sql_expr(lon_col: str, lat_col: str, precision: int = 6,
                     dialect: str = "spark") -> str:
    """The SAME construction as :func:`encode` in portable SQL
    (floor/clamp + unrolled bit extracts + substr into the base-32
    alphabet) — valid in Spark SQL and DuckDB."""
    nlon, nlat = _bit_counts(precision)
    li = (
        f"least(greatest(cast(floor((cast({lon_col} as double) + 180.0) / 360.0"
        f" * {1 << nlon}) as bigint), cast(0 as bigint)), cast({(1 << nlon) - 1} as bigint))"
    )
    la = (
        f"least(greatest(cast(floor((cast({lat_col} as double) + 90.0) / 180.0"
        f" * {1 << nlat}) as bigint), cast(0 as bigint)), cast({(1 << nlat) - 1} as bigint))"
    )
    # reference the two integers via scalar subexpression names is not
    # portable — inline them (constant-folded floor exprs; Catalyst and
    # DuckDB both collapse the shared scans)
    chars = []
    for c in range(precision):
        v_terms = []
        for b in range(5):
            j = 5 * c + b
            if j % 2 == 0:
                bit = f"(({li} >> {nlon - 1 - j // 2}) & 1)"
            else:
                bit = f"(({la} >> {nlat - 1 - (j - 1) // 2}) & 1)"
            v_terms.append(f"{bit} * {1 << (4 - b)}")
        v = "(" + " + ".join(v_terms) + ")"
        chars.append(f"substr('{_B32}', cast({v} as int) + 1, 1)")
    if dialect == "spark":
        return "concat(" + ", ".join(chars) + ")"
    return " || ".join(chars)


def decode_bbox(geohashes):
    """Vectorized inverse: geohash strings → (lat0, lat1, lon0, lon1)
    float64 arrays (the cell's bounding box). De-interleaves each
    char's 5 bits back into the lon/lat integers, then scales."""
    ghs = np.asarray(geohashes, dtype=object)
    flat = ghs.ravel()
    if not len(flat):
        z = np.zeros(ghs.shape)
        return z, z, z, z
    precision = len(flat[0])
    nlon, nlat = _bit_counts(precision)
    vals = np.array(
        [[_B32.index(ch) for ch in g] for g in flat], dtype=np.int64
    )  # (n, precision)
    li = np.zeros(len(flat), dtype=np.int64)
    la = np.zeros(len(flat), dtype=np.int64)
    for c in range(precision):
        for b in range(5):
            j = 5 * c + b
            bit = (vals[:, c] >> (4 - b)) & 1
            if j % 2 == 0:
                li = (li << 1) | bit
            else:
                la = (la << 1) | bit
    lon0 = li / (1 << nlon) * 360.0 - 180.0
    lon1 = (li + 1) / (1 << nlon) * 360.0 - 180.0
    lat0 = la / (1 << nlat) * 180.0 - 90.0
    lat1 = (la + 1) / (1 << nlat) * 180.0 - 90.0

    def shp(a):
        out = np.empty(ghs.shape)
        out.ravel()[:] = a
        return out

    return shp(lat0), shp(lat1), shp(lon0), shp(lon1)
