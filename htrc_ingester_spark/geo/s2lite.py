"""S2-lite: cube-face quadrilateral cell ids, pure numpy.

The `s2geometry`/`s2sphere` wheels are absent here, so this implements
the public S2 construction faithfully through the face/(u,v)/(s,t)/(i,j)
stages — gnomonic cube projection with the quadratic s↔u transform from
the published S2 geometry docs — but linearizes (i,j) with Morton
(Z-order) interleaving instead of the Hilbert curve. Hierarchical
containment, face locality, and determinism are identical; only the
1-D ordering of sibling cells differs from Google S2. Documented
substitution per SURVEY.md §7(c).

Cell id layout (int64, positive): ``face(3 bits) . morton(2*level bits)
. 1 . zeros`` — i.e. the S2-style trailing-sentinel-bit packing, so a
parent id is derivable by masking, exactly like real S2.
"""

from __future__ import annotations

import numpy as np

# Level cap is 29 (not S2's 30) so that face(3 bits) + pos(59 bits) stays
# within a *signed* int64 (Spark LongType has no unsigned 64-bit).
MAX_LEVEL = 29
_POS_BITS = 2 * MAX_LEVEL + 1  # 59


def _xyz_from_latlng(lat, lng):
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    theta = np.deg2rad(np.asarray(lng, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _face_uv(x, y, z):
    """Largest-|component| face selection + gnomonic (u,v), per S2 docs."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        np.choose(face, [x, y, z]) < 0, 3, 0
    )  # faces 3,4,5 are the negative axes
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    # (u, v) per face, following the S2 face coordinate frames
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),  # face 0: +x
            (lambda: -x / y, lambda: z / y, None),  # face 1: +y
            (lambda: -x / z, lambda: -y / z, None),  # face 2: +z
            (lambda: z / x, lambda: y / x, None),  # face 3: -x
            (lambda: z / y, lambda: -x / y, None),  # face 4: -y
            (lambda: -y / z, lambda: -x / z, None),  # face 5: -z
        ]
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face.astype(np.int64), u, v


def _st_from_uv(u):
    """Quadratic transform (published S2 ST_UV quadratic projection)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _morton(i, j, level):
    """Interleave level-bit integers i (x) and j (y) — Z-order."""
    out = np.zeros_like(np.asarray(i, dtype=np.int64))
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    for b in range(level):
        out |= ((i >> b) & 1) << (2 * b + 1)
        out |= ((j >> b) & 1) << (2 * b)
    return out


def latlng_to_cell(lat, lng, level: int = 16):
    """Encode lat/lng to an S2-lite int64 cell id at ``level`` (0..29)."""
    if not (0 <= level <= MAX_LEVEL):
        raise ValueError("level outside [0,29]")
    x, y, z = _xyz_from_latlng(lat, lng)
    face, u, v = _face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip((_st_from_uv(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_st_from_uv(v) * n).astype(np.int64), 0, n - 1)
    pos = _morton(i, j, level)
    # face . pos . 1-sentinel . zero-pad  (S2-style packing)
    cell = (face << _POS_BITS) | (pos << (_POS_BITS - 2 * level)) | (
        np.int64(1) << (_POS_BITS - 2 * level - 1)
    )
    return cell if cell.ndim else np.int64(cell)


def cell_level(cell):
    """Recover level from the trailing sentinel bit position."""
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & (-c)
    return ((_POS_BITS - 1) - np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)) // 2


def cell_to_parent(cell, parent_level: int):
    """Mask down to a coarser level — identical trick to real S2."""
    c = np.asarray(cell, dtype=np.int64)
    new_lsb = np.int64(1) << (_POS_BITS - 2 * parent_level - 1)
    out = (c & ~(new_lsb - 1) & ~new_lsb) | new_lsb
    return out if out.ndim else np.int64(out)


# ---------------------------------------------------------------------------
# SQL expression builder — the SAME construction as latlng_to_cell in
# portable SQL (sin/cos/sqrt/floor/case + integer arithmetic), valid in
# Spark SQL and DuckDB, so the driver's oracle can value-check the S2
# encode exactly like the H3 one. Trig is IEEE-double in both engines;
# a 1-ulp libm difference could flip a floor() only for points within
# ~1e-15 of a cell boundary — immaterial for the synthetic fixtures and
# caught deterministically by the pytest parity check if it ever bites.
# ---------------------------------------------------------------------------

def s2_sql_expr(lon_col: str, lat_col: str, level: int, dialect: str = "spark") -> str:
    if not (0 <= level <= MAX_LEVEL):
        raise ValueError("level outside [0,29]")
    idiv = "div" if dialect == "spark" else "//"
    phi = f"radians(cast({lat_col} as double))"
    theta = f"radians(cast({lon_col} as double))"
    x = f"(cos({phi}) * cos({theta}))"
    y = f"(cos({phi}) * sin({theta}))"
    z = f"sin({phi})"
    ax, ay, az = f"abs({x})", f"abs({y})", f"abs({z})"
    axis = (
        f"(case when {ax} >= {ay} and {ax} >= {az} then 0 "
        f"when {ay} >= {az} then 1 else 2 end)"
    )
    comp = f"(case {axis} when 0 then {x} when 1 then {y} else {z} end)"
    face = f"(case when {comp} < 0 then {axis} + 3 else {axis} end)"

    def uv(f: int) -> tuple[str, str]:
        return {
            0: (f"({y} / {x})", f"({z} / {x})"),
            1: (f"(-{x} / {y})", f"({z} / {y})"),
            2: (f"(-{x} / {z})", f"(-{y} / {z})"),
            3: (f"({z} / {x})", f"({y} / {x})"),
            4: (f"({z} / {y})", f"(-{x} / {y})"),
            5: (f"(-{y} / {z})", f"(-{x} / {z})"),
        }[f]

    u = "(case " + " ".join(f"when {face} = {f} then {uv(f)[0]}" for f in range(6)) + " end)"
    v = "(case " + " ".join(f"when {face} = {f} then {uv(f)[1]}" for f in range(6)) + " end)"

    def st(e: str) -> str:
        return (
            f"(case when {e} >= 0 then 0.5 * sqrt(1.0 + 3.0 * {e}) "
            f"else 1.0 - 0.5 * sqrt(1.0 - 3.0 * {e}) end)"
        )

    n = 1 << level
    i = f"least(greatest(cast(floor({st(u)} * {n}) as bigint), cast(0 as bigint)), cast({n - 1} as bigint))"
    j = f"least(greatest(cast(floor({st(v)} * {n}) as bigint), cast(0 as bigint)), cast({n - 1} as bigint))"
    # Morton interleave as integer arithmetic (no shift operators needed)
    terms = []
    for b in range(level):
        terms.append(f"((({i}) {idiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"((({j}) {idiv} {1 << b}) % 2) * {1 << (2 * b)}")
    pos = "(" + " + ".join(terms) + ")" if terms else "0"
    pad = _POS_BITS - 2 * level
    return (
        f"(cast({face} as bigint) * {1 << _POS_BITS} + "
        f"cast({pos} as bigint) * {1 << pad} + {1 << (pad - 1)})"
    )
