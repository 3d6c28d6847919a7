"""SparkSession builder tuned for this engine.

Local-mode testing defaults; the same configs are what we'd submit with
``spark-submit --py-files`` on a real cluster (AQE, Arrow, skew join).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def static_plan(spark: SparkSession):
    """Run enclosed ACTIONS with AQE disabled, restoring the flag
    after. Iterative operators with bounded, known-small per-round
    state (Bellman-Ford rounds, kNN ring expansion in the
    pinned-broadcast regime) are the anti-case for adaptive execution:
    every round's shuffle becomes a materialize-then-replan query
    stage — a scheduled job each — and there is nothing for the
    replanner to learn. Measured: raster cost-distance 6.1→4.7 s cold.
    Conf is session-global for the duration: the engine is
    single-driver by design; callers running concurrent queries from
    other threads should not wrap them in this."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def get_spark(
    app_name: str = "htrc_ingester_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or '*'. Shuffle partitions
    default to the core count — at cluster scale this would be set to
    2-3x total executor cores instead.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        sp = shuffle_partitions or (int(env) if env else 32)
    else:
        master = f"local[{cores}]"
        sp = shuffle_partitions or cores

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches: the refine/phash UDFs are vectorized
        # numpy — per-batch overhead dominates at the 10k default
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # bytes-heavy tables: default 128m splits under-parallelize the
        # Python decode stages (a 1 GB binary column = 8 tasks on 32
        # cores; measured 4.6x slowdown). 16m keeps every worker fed;
        # at cluster scale revisit per-table via files.maxPartitionBytes
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
