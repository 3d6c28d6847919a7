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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from htrc_ingester_spark.plans import flagship

    return flagship.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from htrc_ingester_spark.plans import catalog

    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    from htrc_ingester_spark.plans import catalog

    return catalog.oracle_sql()
