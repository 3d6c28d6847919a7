"""kNN join via iterative cell-ring expansion (SURVEY.md §2.3 / §7 step 4).

For each query point, search the images table one growing cell-disk at
a time instead of scanning everything:

  round i: frontier = disk(r_i) \\ searched_cells   (driver-side, tiny)
           candidates = images ⋈ broadcast(frontier) on cell
           per-query top-k (window over the candidate skeleton)
           merge into driver-side best-so-far
           terminate query when kth_dist ≤ guaranteed_bound(r_i)

Correctness of the termination bound (proved, test-asserted):
- any point in a cell-row farther than r rows from the query's row is
  at least ``r * cell_h_deg`` degrees of latitude away, and a great
  circle distance is ≥ its latitude arc ⇒ dist ≥ r·cell_h_m.
- within the covered rows, the disk is widened anisotropically so that
  every cell whose minimum possible distance is below that bound is
  covered: required lon half-width follows from the haversine lon term
  ``dist ≥ 2R·asin(√(cos φq cos φp)·sin(Δλ/2))`` with the band-minimum
  cosine; near the poles this degrades to full-wrap coverage (which
  ``grid_disk`` caps at nx/2 columns).

Ties are broken by the total order ``(dist, image_id)`` — deterministic
across partitionings and cluster sizes (SURVEY.md §7 hard-part (a)).

Scale notes: only the (image_id, lon, lat, cell) skeleton is ever
joined or shuffled — never image bytes. The per-round shuffle is the
top-k window keyed by query_id; candidate volume is bounded by the
frontier, not the table. The driver holds only per-query top-k lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import h3_cell, haversine_m
from ..geo import h3lite as H

EARTH_RADIUS_M = 6_371_008.8


def _required_kx(bound_m: float, lat_q: float, r: int, res: int) -> int:
    """Columns of lon half-width needed so every point nearer than
    ``bound_m`` inside the covered rows is in a covered cell."""
    ch = H.cell_h_deg(res)
    band_lo = max(-90.0, lat_q - (r + 1) * ch)
    band_hi = min(90.0, lat_q + (r + 1) * ch)
    cos_min = min(np.cos(np.deg2rad(band_lo)), np.cos(np.deg2rad(band_hi)))
    s = np.sin(bound_m / (2.0 * EARTH_RADIUS_M))
    if cos_min <= 0.0 or s / cos_min >= 1.0:
        return H.nx(res)  # full wrap
    dlon_deg = np.rad2deg(2.0 * np.arcsin(s / cos_min))
    return int(np.ceil(dlon_deg / H.cell_w_deg(res))) + 1


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    queries: pd.DataFrame,
    res: int = 7,
    id_col: str = "image_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_rounds: int = 32,
) -> DataFrame:
    """k nearest ``points`` per query row. ``queries`` is a small
    driver-side pandas frame (query_id, lon, lat, k).

    Returns a DataFrame (query_id, image_id, dist_m, rank) with
    rank 1..k ordered by (dist_m, image_id).
    """
    skel = points.select(
        F.col(id_col).alias("image_id"),
        F.col(lon_col).alias("p_lon"),
        F.col(lat_col).alias("p_lat"),
        h3_cell(lon_col, lat_col, res).alias("cell"),
    )
    skel = skel.persist()
    try:
        return _knn_loop(spark, skel, queries, res, max_rounds)
    finally:
        skel.unpersist()


def _knn_loop(spark, skel, queries, res, max_rounds):
    ch_m = H.cell_h_deg(res) * H.M_PER_DEG_LAT
    state: dict[str, dict] = {}
    for row in queries.itertuples(index=False):
        state[row.query_id] = {
            "lon": float(row.lon),
            "lat": float(row.lat),
            "k": int(row.k),
            "cell": int(H.latlng_to_cell(row.lat, row.lon, res)),
            "searched": set(),
            "best": pd.DataFrame(columns=["image_id", "dist_m"]),
            "done": False,
            "r": 0,
        }
    total_cells = H.nx(res) * H.ny(res)
    frontier_schema = T.StructType(
        [
            T.StructField("query_id", T.StringType(), False),
            T.StructField("q_lon", T.DoubleType(), False),
            T.StructField("q_lat", T.DoubleType(), False),
            T.StructField("k", T.IntegerType(), False),
            T.StructField("cell", T.LongType(), False),
        ]
    )
    r_next = {qid: 1 for qid in state}
    for _ in range(max_rounds):
        frames = []
        for qid, st in state.items():
            if st["done"]:
                continue
            r = r_next[qid]
            bound = r * ch_m
            kx = _required_kx(bound, st["lat"], r, res)
            disk = H.grid_disk(st["cell"], r, kx)
            new = np.array(sorted(set(disk.tolist()) - st["searched"]), dtype=np.int64)
            st["searched"].update(int(c) for c in new)
            st["r"] = r
            if len(new):
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "q_lon": st["lon"],
                            "q_lat": st["lat"],
                            "k": st["k"],
                            "cell": new,
                        }
                    )
                )
        if not frames:
            break
        frontier = spark.createDataFrame(pd.concat(frames, ignore_index=True), schema=frontier_schema)
        cand = skel.join(F.broadcast(frontier), "cell", "inner").withColumn(
            "dist_m", haversine_m("q_lat", "q_lon", "p_lat", "p_lon")
        )
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("image_id").asc())
        top = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= F.col("k"))
            .select("query_id", "image_id", "dist_m")
            .toPandas()
        )
        # merge round results into per-query best-so-far, check termination
        for qid, st in state.items():
            if st["done"]:
                continue
            new_best = top[top.query_id == qid][["image_id", "dist_m"]]
            parts = [f for f in (st["best"], new_best) if len(f)]
            merged = (
                pd.concat(parts, ignore_index=True)
                .sort_values(["dist_m", "image_id"], kind="mergesort")
                .drop_duplicates("image_id")
                .head(st["k"])
                if parts
                else st["best"]
            )
            st["best"] = merged
            exhausted = len(st["searched"]) >= total_cells
            bound = st["r"] * ch_m
            # STRICT <: at exactly the bound an unsearched point could
            # tie on distance and win on image_id — keep expanding
            if exhausted or (len(merged) >= st["k"] and float(merged.dist_m.max()) < bound):
                st["done"] = True
            else:
                r_next[qid] = min(st["r"] * 2, H.ny(res))
                if r_next[qid] == st["r"]:
                    r_next[qid] = st["r"] + 1
    out_rows = []
    for qid, st in state.items():
        b = st["best"].reset_index(drop=True)
        for i in range(len(b)):
            out_rows.append((qid, str(b.image_id[i]), float(b.dist_m[i]), i + 1))
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.StringType(), False),
            T.StructField("image_id", T.StringType(), False),
            T.StructField("dist_m", T.DoubleType(), False),
            T.StructField("rank", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(out_rows, schema=out_schema)


def knn_join_bruteforce(
    spark: SparkSession,
    points: DataFrame,
    queries: pd.DataFrame,
    id_col: str = "image_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Exact baseline: broadcast cross join + window. O(|points|·|queries|)
    — the oracle for the iterative operator and the right plan when the
    query side is tiny and the table is small."""
    qdf = spark.createDataFrame(queries)
    cand = (
        points.select(
            F.col(id_col).alias("image_id"),
            F.col(lon_col).alias("p_lon"),
            F.col(lat_col).alias("p_lat"),
        )
        .crossJoin(
            F.broadcast(
                qdf.select(
                    "query_id",
                    F.col("lon").alias("q_lon"),
                    F.col("lat").alias("q_lat"),
                    F.col("k").cast("int").alias("k"),
                )
            )
        )
        .withColumn("dist_m", haversine_m("q_lat", "q_lon", "p_lat", "p_lon"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("image_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "image_id", "dist_m", "rank")
    )
