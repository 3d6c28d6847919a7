#!/usr/bin/env python
"""Child job for the two-parallelism scaling benchmark (north rule).

Launched via ``spark-submit --master local[N] --py-files engine.zip``
— the same submit path a multi-executor cluster would use; only the
master URL changes between the N and 4N runs.

Runs the BASELINE.json metric pipeline (H3-encode → PIP-join →
tile-assign → agg) over an inflated deterministic images table
(lineitem × MULT rows, distinct ids) and prints one JSON line:
{"cpus", "n_images", "wall_sec", "images_per_sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    spark = (
        SparkSession.builder.appName(f"scaling[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from htrc_ingester_spark.plans import flagship as FS
    from htrc_ingester_spark.operators.pip_join import pip_join
    from htrc_ingester_spark.operators.tiles import assign_tiles

    # inflate: each lineitem row becomes `mult` images with distinct ids
    # and jittered positions — same hot-cell-skewed shape, mult× volume.
    # 4*cpus input partitions so both runs have identical split layout
    # relative to their core count is NOT what we want — fix the
    # partition count so the DATA layout is identical across runs.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    base = spark.sql(FS.images_sql()).repartition(256)
    images = (
        base.withColumn("rep", F.explode(F.expr(f"sequence(1, {mult})")))
        .select(
            (F.col("image_id") * mult + F.col("rep")).alias("image_id"),
            (F.col("lon") + (F.col("rep") - mult / 2) * 1e-4).alias("lon"),
            (F.col("lat") + (F.col("rep") - mult / 2) * 1e-4).alias("lat"),
        )
    )

    def run_pipeline(src):
        hits = pip_join(spark, src, FS.RECTS, res=FS.RES)
        tiled = assign_tiles(hits, zoom_res=FS.ZOOM_RES, n_tiles=FS.N_TILES)
        out = tiled.groupBy("poly_id", "tile_id").agg(F.count(F.lit(1)).alias("n_images"))
        out.count()

    # materialize the inflated input once so the measured section is the
    # PIPELINE (encode→PIP→tile→agg), not the synthetic-data generator
    images = images.persist()
    n_images = images.count()
    # warm: Arrow python worker spawn (one-time per executor process)
    # + C2 JIT of the codegen'd stages — a real cluster amortizes both
    run_pipeline(images.sample(0.05, seed=1))

    # steady-state throughput: best of 3 full runs (the north-rule
    # metric is sustained images/sec, not cold-start latency)
    wall = min(
        (lambda t0: (run_pipeline(images), time.monotonic() - t0)[1])(time.monotonic())
        for _ in range(3)
    )

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_images": n_images,
                "wall_sec": round(wall, 3),
                "images_per_sec": round(n_images / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
