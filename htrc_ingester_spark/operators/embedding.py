"""Similarity search + embedding near-dup over `embeddings`
(array<float> column), task-brief "similarity search" family.

Two plans:

- brute-force cosine/dot top-k — correct baseline, O(N) per query,
  expressed entirely with built-in higher-order functions
  (``zip_with`` + ``aggregate``) — JVM-side, no UDF, no shuffle beyond
  the final top-k;
- hyperplane-LSH bucketed ANN — the scale path: 8 deterministic
  random-ish hyperplanes whose ±1 components derive from md5 hex-char
  parity (identical arithmetic in Spark SQL and DuckDB, so the oracle
  value-checks the real bucketing); bucket = 8-bit signature; queries
  probe only their bucket. At 10^12 rows the bucket column becomes the
  partition key (bucket-pruned scans); multi-probe = flip one bit at a
  time (hamming-1 neighbors) for recall without rescanning.

Near-dup: same-bucket self-join candidates → exact cosine verify ≥ τ
— the MinHash/LSH shape (textdedup.py) transplanted to vectors.

No RNG anywhere: hyperplane component s(p, d) = ±1 from
``ascii(substr(md5('p<p>:<d>'), 1, 1)) % 2`` — hex digits split 8/8 on
ascii parity, so components are unbiased and fixed forever (the
determinism discipline of the north rule: same input ⇒ same bucket on
any cluster size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PLANES = 8


def sign_array_sql(plane: int, dim: int, dialect: str) -> str:
    """±1.0 component array of hyperplane ``plane`` (length ``dim``)."""
    if dialect == "spark":
        comp = (
            f"cast(2 * (ascii(substr(md5(concat('p{plane}:', cast(d as string))), 1, 1)) % 2)"
            f" - 1 as double)"
        )
        return f"transform(sequence(0, {dim - 1}), d -> {comp})"
    comp = f"cast(2 * (ascii(substr(md5('p{plane}:' || d), 1, 1)) % 2) - 1 as double)"
    return f"list_transform(range(0, {dim}), d -> {comp})"


def dot_sql(vec_a: str, vec_b: str, dialect: str) -> str:
    """Sequential-order dot product (deterministic fold in both)."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({vec_a}, {vec_b},"
            f" (a, b) -> cast(a as double) * cast(b as double)),"
            f" cast(0.0 as double), (acc, x) -> acc + x)"
        )
    return f"list_dot_product(cast({vec_a} as double[]), cast({vec_b} as double[]))"


def norm_sql(vec: str, dialect: str) -> str:
    return f"sqrt({dot_sql(vec, vec, dialect)})"


def bucket_sql(vec: str, dim: int, dialect: str) -> str:
    """8-bit LSH bucket: bit p = sign of <vec, plane_p>."""
    bits = [
        f"(case when {dot_sql(vec, sign_array_sql(p, dim, dialect), dialect)} > 0"
        f" then {1 << p} else 0 end)"
        for p in range(N_PLANES)
    ]
    return "(" + " + ".join(bits) + ")"


def cosine_sql(vec_a: str, vec_b: str, dialect: str) -> str:
    return (
        f"({dot_sql(vec_a, vec_b, dialect)} /"
        f" ({norm_sql(vec_a, dialect)} * {norm_sql(vec_b, dialect)}))"
    )


def with_bucket(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    return df.withColumn("bucket", F.expr(bucket_sql(vec_col, dim, "spark")).cast("int"))


def ann_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Bucketed approximate top-k: each query scans only its bucket.
    query_df: (query_id, embedding). Returns (query_id, vec_id, cos,
    rank) ranked by (cos desc, vec_id) — total order, deterministic."""
    from pyspark.sql import Window

    data = with_bucket(df, vec_col, dim)
    q = with_bucket(
        query_df.select(F.col("query_id"), F.col(vec_col).alias("_qv")), "_qv", dim
    ).withColumnRenamed("bucket", "_qb")
    cand = data.join(F.broadcast(q), F.col("bucket") == F.col("_qb"), "inner").withColumn(
        "cos", F.expr(f"round({cosine_sql(vec_col, '_qv', 'spark')}, 5)")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.999,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs: same-bucket candidates → exact
    cosine ≥ threshold. Returns (id_a, id_b, cos)."""
    b = with_bucket(df.select(id_col, vec_col), vec_col, dim)
    a1 = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("bucket")
    )
    a2 = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("bucket")
    )
    return (
        a1.join(a2, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.expr(f"round({cosine_sql('_va', '_vb', 'spark')}, 5)"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
