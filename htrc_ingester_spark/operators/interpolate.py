"""Spatial interpolation: inverse-distance-weighted (IDW) estimation
of a point-sampled field at arbitrary target locations.

The classic gridding op (sensor readings → surface, sparse quality
scores → coverage map) expressed Spark-first as a composition of two
operators this engine already proves correct: the radius join supplies
every (target, sample) pair within the cutoff — one cell-disk explode,
one equi-join on cell, exact haversine filter, with the sample's value
column riding the same join (``carry_cols``, no second lookup) — and
the estimate itself is one ``groupBy(query_id)`` computing
``Σ w·v / Σ w`` with ``w = 1/max(d, eps)^p``, which Catalyst runs with
map-side partial aggregation. Total cost: the radius join's single
shuffle plus one bounded aggregate exchange (one row per target per
task before combine); nothing driver-side, no UDF.

Division-by-zero discipline: a sample exactly at the target would make
``1/d^p`` infinite, so distances clamp to ``eps_m`` (default 1 m) —
the standard smoothing-IDW formulation; with multiple coincident
samples the estimate degrades gracefully to their (weighted) mean
rather than NaN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .knn_join import radius_join


def idw_interpolate(
    spark: SparkSession,
    points: DataFrame,
    targets: DataFrame,
    radius_m: float,
    value_col: str = "value",
    power: float = 2.0,
    eps_m: float = 1.0,
    res: int | None = None,
    id_col: str = "image_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Estimate ``value_col`` at each target from samples within
    ``radius_m`` meters: ``Σ v/max(d,eps)^p / Σ 1/max(d,eps)^p``.

    ``targets``: DataFrame (query_id, lon, lat). Returns one row per
    target WITH support: (query_id, idw_value, n_support,
    nearest_m) — targets with no sample in radius are absent (inner
    semantics; left-join a target spine for explicit nulls).
    """
    hits = radius_join(
        spark,
        points,
        targets,
        radius_m=radius_m,
        res=res,
        id_col=id_col,
        lon_col=lon_col,
        lat_col=lat_col,
        carry_cols=[value_col],
    )
    w = F.pow(F.lit(1.0) / F.greatest(F.col("dist_m"), F.lit(float(eps_m))), F.lit(float(power)))
    return (
        hits.withColumn("__w", w)
        .groupBy("query_id")
        .agg(
            (F.sum(F.col("__w") * F.col(value_col)) / F.sum("__w")).alias("idw_value"),
            F.count(F.lit(1)).alias("n_support"),
            F.min("dist_m").alias("nearest_m"),
        )
    )
