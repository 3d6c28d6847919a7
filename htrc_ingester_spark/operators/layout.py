"""Z-order (Morton) data layout for spatial scan pruning.

At 10^12 images the dominant cost of any bbox-shaped query (PIP join
against a regional polygon set, tile rollup of one country, geofence
backfill) is the parquet scan itself. Parquet readers — Spark's and
DuckDB's alike — skip a row group when its column min/max statistics
exclude the predicate, but min/max on ``lon`` is useless when the file
order is ingest order: every row group spans the whole planet. Sorting
the table by an interleaved-bit (Morton / Z-order) key of quantized
(lon, lat) makes BOTH coordinates simultaneously clustered, so every
row group covers a small spatial rectangle and a bbox predicate prunes
all but O(perimeter) of them. This is the same trick Delta/Iceberg
expose as ``ZORDER BY`` / sort-order transforms; here it is a plain
column expression plus ``repartitionByRange`` + ``sortWithinPartitions``
— no table-format dependency, works on any parquet sink.

Reference parity note: HTRC-Ingester has no spatial layout (north-rule
extension); its analog is the pairtree prefix ordering of the rsync
walk (reference DownloadThread pairtree grouping), which clusters by id
prefix for the same skip-reads reason.

The key is exact integer arithmetic (quantize → interleave), identical
in Spark SQL and DuckDB, so catalog entries over it are value-checked
by the driver gate like every other encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16  # 2^16 x 2^16 grid → ~600 m cells at the equator


def zorder_sql_expr(
    lon_col: str, lat_col: str, bits: int = DEFAULT_BITS, dialect: str = "spark"
) -> str:
    """Morton key of quantized (lon, lat) as portable SQL.

    Quantization: ix = clamp(floor((lon+180)/360 * 2^bits)), iy likewise
    over [-90, 90); interleave ix (odd bit positions) with iy (even) —
    the same integer-arithmetic interleave as geo/s2lite.s2_sql_expr,
    valid in both engines (no shift operators; idiv spelled per
    dialect). Result fits int64 for bits ≤ 31.
    """
    if not (1 <= bits <= 31):
        raise ValueError("bits outside [1, 31]")
    idiv = "div" if dialect == "spark" else "//"
    n = 1 << bits

    def q(col: str, lo: float, span: float) -> str:
        scaled = (
            f"cast(floor((cast({col} as double) - cast('{lo!r}' as double))"
            f" / cast('{span!r}' as double) * {n}) as bigint)"
        )
        return f"least(greatest({scaled}, cast(0 as bigint)), cast({n - 1} as bigint))"

    ix = q(lon_col, -180.0, 360.0)
    iy = q(lat_col, -90.0, 180.0)
    terms = []
    for b in range(bits):
        terms.append(f"((({ix}) {idiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"((({iy}) {idiv} {1 << b}) % 2) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = DEFAULT_BITS,
    key_col: str = "zkey",
) -> DataFrame:
    """Attach the Morton key as a whole-stage-codegen column."""
    return df.withColumn(key_col, F.expr(zorder_sql_expr(lon_col, lat_col, bits)))


def zorder_write(
    df: DataFrame,
    path: str,
    num_files: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet laid out in Z-order.

    ``repartitionByRange`` on the key gives globally disjoint key
    ranges per file (one skew-aware range exchange — Spark samples the
    key distribution, so hot cities don't produce giant files);
    ``sortWithinPartitions`` then orders rows inside each file so
    row-group min/max stats are tight. The key column itself is
    dropped from the files: it is derivable, and layout is not schema.
    """
    keyed = with_zorder_key(df, lon_col, lat_col, bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_fraction(
    path: str,
    bbox: tuple[float, float, float, float],
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> tuple[int, int]:
    """(row groups a bbox scan must read, total row groups) from the
    parquet footers — the exact statistics Spark's and DuckDB's readers
    prune on, measured without running either engine. Test/observability
    helper (driver-side, reads footers only — no data pages)."""
    import pyarrow.dataset as ds

    x0, y0, x1, y1 = bbox
    must_read = total = 0
    dataset = ds.dataset(path, format="parquet")
    for frag in dataset.get_fragments():
        meta = frag.metadata
        schema_names = list(meta.schema.names)
        li, la = schema_names.index(lon_col), schema_names.index(lat_col)
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            lon_s, lat_s = g.column(li).statistics, g.column(la).statistics
            total += 1
            if lon_s is None or lat_s is None:
                must_read += 1  # no stats → reader cannot skip
                continue
            overlap = (
                lon_s.min <= x1
                and lon_s.max >= x0
                and lat_s.min <= y1
                and lat_s.max >= y0
            )
            must_read += int(overlap)
    return must_read, total


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Hive-style partitioned layout: directory-level pruning, the
    coarser sibling of the Z-order row-group skip. A scan with an
    equality/IN predicate on a partition column never OPENS the other
    directories — at 10^12 rows that is the difference between listing
    a prefix and scanning a lake. One exchange keyed by the partition
    columns first, so each directory gets ONE file instead of one
    shard per upstream task (the small-files failure mode
    tables.compact exists to repair); at real scale repartition by
    (cols, salt) for multiple right-sized files per directory."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )


def partition_prune_report(spark, path: str, predicate: str) -> dict:
    """{files_total, files_read, partition_filters}: proof that the
    predicate prunes at the DIRECTORY level — partition filters appear
    in the scan node and the pruned file count drops accordingly."""
    full = spark.read.parquet(path)
    filtered = full.where(predicate)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    pf = [ln.strip() for ln in plan.splitlines() if "PartitionFilters" in ln]

    def files_touched(df) -> int:
        # inputFiles() reports the relation PRE-pruning; count the
        # files the executed scan actually reads instead
        return df.select(F.input_file_name()).distinct().count()

    return {
        "files_total": len(full.inputFiles()),
        "files_read": files_touched(filtered),
        "partition_filters": pf[0] if pf else "",
    }
