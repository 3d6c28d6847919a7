"""Exactly-replayable Lloyd k-means over embedding vectors.

The iterative-ML leg of the training-data family (corpus clustering
for curriculum/domain balancing, IVF codebook training — see
embedding.ivf_topk, whose md5-parity centroids this generalizes to
data-driven ones).

Why it value-MATCHes a SQL oracle when float k-means can't: every
arithmetic step is INTEGER. Vectors are quantized once to
``round(x * quant) + QOFF`` (QOFF shifts everything nonnegative, so
truncating and flooring integer division agree across engines; the
shift cancels inside every distance difference). Distances are integer
sums of squares; centroid updates are elementwise integer floor-means.
No float ever enters an aggregation, so shuffle order / association
order cannot perturb a single bit, on any cluster size — determinism
by construction, the same discipline as dataset_split_assign.

Shapes at 10^12 rows: the assign step is a map-only cross join against
the BROADCAST centroid set (k rows); the update step is ONE
(cluster, pos)-keyed exchange with k×dim reduce keys and map-side
partial aggregation — textbook Lloyd on Spark. ``iters`` chains these
lazily; pass ``persist_input=True`` (default) to cache the quantized
input that every iteration re-scans.

Empty clusters simply drop out of the centroid set (deterministically
in both engines); seeding is the k lowest ``md5('km:' || id)`` rows —
content-keyed, partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans_lite", "kmeans_oracle_sql", "QOFF"]

QOFF = 1024  # quantization offset: keeps every coordinate nonnegative


def _quant_expr(vec: str, quant: int, dialect: str) -> str:
    tf = "transform" if dialect == "spark" else "list_transform"
    return (
        f"{tf}({vec}, x -> cast(round(cast(x as double) * {quant}) as bigint)"
        f" + {QOFF})"
    )


def _dist_expr(a: str, b: str, dim: int, dialect: str) -> str:
    """Integer squared L2 via an index fold (element_at/[] dialect split)."""
    if dialect == "spark":
        term = f"(element_at({a}, j) - element_at({b}, j))"
        return (
            f"aggregate(transform(sequence(1, {dim}), j -> {term} * {term}),"
            f" cast(0 as bigint), (acc, x) -> acc + x)"
        )
    term = f"({a}[j] - {b}[j])"
    return f"list_sum(list_transform(range(1, {dim} + 1), j -> {term} * {term}))"


def kmeans_lite(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1000,
    persist_input: bool = True,
) -> DataFrame:
    """Returns the final (``id_col``, cluster:int) assignment after
    ``iters`` Lloyd iterations from the deterministic md5 seeding."""
    qt = df.select(
        F.col(id_col), F.expr(_quant_expr(vec_col, quant, "spark")).alias("qv")
    )
    if persist_input:
        qt = qt.persist()
    # seeding: k lowest md5 rows via a distributed TakeOrdered (never a
    # global single-partition window — that would sort all 10^12 rows
    # on one task); the row_number window then runs over k rows only.
    h = F.md5(F.concat(F.lit("km:"), F.col(id_col).cast("string")))
    seeds = qt.withColumn("_h", h).orderBy("_h", id_col).limit(k)
    centroids = seeds.select(
        (F.row_number().over(Window.orderBy("_h", F.col(id_col))) - 1)
        .cast("int")
        .alias("cluster"),
        F.col("qv").alias("cv"),
    )
    # assign = map-only HOF argmin against the centroid set folded into
    # ONE broadcast row: array_min over struct(dist, cluster) is the
    # (dist, cluster) tie-break with zero shuffle — the N×k expansion
    # a crossJoin+window would re-shuffle by id never materializes.
    dist_c = _dist_expr("qv", "c.cv", dim, "spark")
    argmin = (
        f"array_min(transform(cs, c -> struct({dist_c} as dist,"
        f" c.cluster as cluster))).cluster"
    )
    assign = None
    for _ in range(iters):
        cs = centroids.agg(
            F.expr("array_sort(collect_list(struct(cluster, cv)))").alias("cs")
        )
        assign = qt.crossJoin(F.broadcast(cs)).select(
            id_col, F.expr(argmin).alias("cluster"), "qv"
        )
        centroids = (
            assign.select(
                id_col, "cluster", F.posexplode("qv").alias("pos", "v")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("c", F.expr("s div n"))  # nonneg by QOFF: trunc == floor
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x.c
                ).alias("cv")
            )
        )
    return assign.select(id_col, "cluster")


def kmeans_oracle_sql(
    source_sql: str,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1000,
) -> str:
    """DuckDB twin: the same seeding, assignment, and integer floor-mean
    update unrolled as a CTE chain (one a{i}/c{i} pair per iteration)."""
    d = _dist_expr("q.qv", "c.cv", dim, "duckdb")
    parts = [
        f"qt as (select {id_col}, {_quant_expr(vec_col, quant, 'duckdb')} as qv"
        f" from ({source_sql}))",
        f"seeds as (select qv, row_number() over (order by"
        f" md5('km:' || cast({id_col} as varchar)), {id_col}) as rn from qt)",
        "c0 as (select cast(rn - 1 as int) as cluster, qv as cv from seeds"
        f" where rn <= {k})",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"a{i} as (select {id_col}, cluster, qv from ("
            f" select q.{id_col}, c.cluster, q.qv, row_number() over ("
            f" partition by q.{id_col} order by {d}, c.cluster) as rn"
            f" from qt q cross join c{i - 1} c) where rn = 1)"
        )
        if i < iters:
            parts.append(
                f"c{i} as (select cluster, list(s // n order by pos) as cv from ("
                f" select cluster, pos, sum(v) as s, count(*) as n from ("
                f" select cluster, unnest(qv) as v,"
                f" unnest(range(1, {dim} + 1)) as pos from a{i})"
                f" group by 1, 2) group by 1)"
            )
    return (
        "with " + ",\n".join(parts) + f"\nselect {id_col}, cluster from a{iters}"
    )
