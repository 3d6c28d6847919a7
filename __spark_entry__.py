"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship spatial pipeline (H3-encode → PIP-join →
tile-assign → aggregate) on sf0.001. ``queries``/``oracle_sql`` expose
the operator catalog (htrc_ingester_spark/plans/catalog.py) — one entry
per implemented operator family from SURVEY.md §2, each with a DuckDB
oracle where the semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python WORKERS don't inherit the driver's sys.path: if the harness
# runs from another cwd, UDF deserialization can't import the package.
# Belt (pre-JVM): PYTHONPATH env; braces (post-JVM): addPyFile below.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package zip to executors (spark-submit --py-files
    equivalent) — required when the JVM predates our PYTHONPATH."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), "htrc_ingester_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(_REPO, "htrc_ingester_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    from htrc_ingester_spark.plans import flagship

    return flagship.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from htrc_ingester_spark.plans import catalog

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            _ensure_shipped(spark)
            return _fn(spark, sf_dir)

        return inner

    return {k: wrap(v) for k, v in catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    from htrc_ingester_spark.plans import catalog

    return catalog.oracle_sql()
