"""Z-order layout: key correctness and the physical skip-reads claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htrc_ingester_spark.operators.layout import (
    rowgroup_prune_fraction,
    with_zorder_key,
    zorder_sql_expr,
    zorder_write,
)


def _py_zkey(lon: float, lat: float, bits: int) -> int:
    n = 1 << bits
    ix = min(max(int((lon + 180.0) / 360.0 * n // 1), 0), n - 1)
    iy = min(max(int((lat + 90.0) / 180.0 * n // 1), 0), n - 1)
    out = 0
    for b in range(bits):
        out |= ((ix >> b) & 1) << (2 * b + 1)
        out |= ((iy >> b) & 1) << (2 * b)
    return out


class TestZorderKey:
    def test_matches_python_reference(self, spark):
        pts = [
            (-180.0, -90.0),
            (179.999, 89.999),
            (0.0, 0.0),
            (-122.42, 37.77),
            (2.35, 48.86),
            (139.69, 35.68),
            (180.0, 90.0),  # clamp: out-of-range top edge
            (-180.0001, -90.0001),  # clamp: below range
        ]
        df = spark.createDataFrame(pts, "lon double, lat double")
        got = with_zorder_key(df, bits=10).orderBy("lon").collect()
        for r in got:
            assert r.zkey == _py_zkey(r.lon, r.lat, 10), (r.lon, r.lat)

    def test_duckdb_dialect_parity(self, spark):
        import duckdb

        pts = [(lon / 7.0, lat / 11.0) for lon in range(-1200, 1200, 97) for lat in range(-900, 900, 131)]
        df = spark.createDataFrame(pts, "lon double, lat double")
        s = with_zorder_key(df, bits=12).orderBy("lon", "lat").toPandas()
        con = duckdb.connect()
        con.register("pts", df.toPandas())
        d = con.sql(
            f"select lon, lat, {zorder_sql_expr('lon', 'lat', 12, 'duckdb')} as zkey"
            " from pts order by lon, lat"
        ).df()
        assert list(s.zkey) == list(d.zkey)

    def test_bits_bounds(self, spark):
        with pytest.raises(ValueError):
            zorder_sql_expr("lon", "lat", 0)
        with pytest.raises(ValueError):
            zorder_sql_expr("lon", "lat", 32)

    def test_locality_of_neighbors(self, spark):
        """Points in the same small rectangle share a key prefix:
        max in-rectangle key spread ≪ cross-planet spread."""
        close = [(10.0 + i / 1000.0, 20.0 + j / 1000.0) for i in range(4) for j in range(4)]
        df = spark.createDataFrame(close, "lon double, lat double")
        keys = [r.zkey for r in with_zorder_key(df, bits=16).collect()]
        assert max(keys) - min(keys) < (1 << 12)  # same 2^10-cell neighborhood


class TestZorderLayoutSkipping:
    def test_zorder_prunes_rowgroups_ingest_order_does_not(self, spark, tmp_path):
        """The whole point of the operator: the SAME rows, the SAME bbox
        filter, ~10× fewer row groups touched when laid out in Z-order
        vs ingest (id) order — measured from the real parquet footers
        (the stats both Spark's and DuckDB's readers prune on)."""
        n = 200_000
        # deterministic planet-wide scatter with three hot cities,
        # ingest order = id order (interleaves regions, worst case)
        df = spark.range(n).select(
            F.col("id"),
            (F.when(F.col("id") % 5 < 4, F.lit(-122.42) + (F.col("id") % 2001 - 1000) / 5000.0)
             .otherwise((F.col("id") * 7919 % 360000) / 1000.0 - 180.0)).alias("lon"),
            (F.when(F.col("id") % 5 < 4, F.lit(37.77) + (F.col("id") % 1999 - 999) / 5000.0)
             .otherwise((F.col("id") * 104729 % 180000) / 1000.0 - 90.0)).alias("lat"),
        )
        ingest_path = str(tmp_path / "ingest")
        z_path = str(tmp_path / "zorder")
        df.repartitionByRange(16, "id").sortWithinPartitions("id").write.parquet(ingest_path)
        zorder_write(df, z_path, num_files=16)

        bbox = (2.0, 48.0, 3.0, 49.5)  # Paris-ish box, away from the hot city
        z_read, z_total = rowgroup_prune_fraction(z_path, bbox)
        i_read, i_total = rowgroup_prune_fraction(ingest_path, bbox)
        assert z_total >= 16 and i_total >= 16
        # ingest order: every row group spans the planet → reads ~all
        assert i_read >= 0.9 * i_total
        # z-order: only the groups overlapping the box
        assert z_read <= 0.25 * z_total, (z_read, z_total)

        # and the layouts are semantically identical under the filter
        pred = (
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
        )
        a = {r.id for r in spark.read.parquet(z_path).where(pred).collect()}
        b = {r.id for r in spark.read.parquet(ingest_path).where(pred).collect()}
        assert a == b and len(a) > 0

    def test_written_schema_drops_key(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lon double, lat double")
        p = str(tmp_path / "t")
        zorder_write(df, p, num_files=1)
        assert set(spark.read.parquet(p).columns) == {"id", "lon", "lat"}


class TestPartitionPruning:
    def test_directory_pruning_reads_one_partition(self, spark, tmp_path):
        from htrc_ingester_spark.operators.layout import (
            partition_prune_report,
            partitioned_write,
        )

        df = spark.range(0, 5000).selectExpr(
            "id", "concat('src', cast(id % 8 as string)) as source"
        )
        path = str(tmp_path / "parted")
        partitioned_write(df, path, ["source"])
        rep = partition_prune_report(spark, path, "source = 'src3'")
        assert rep["files_total"] == 8           # one file per partition dir
        assert rep["files_read"] == 1            # only src3's directory
        assert "source" in rep["partition_filters"]
        # and the data survives the layout round-trip
        got = spark.read.parquet(path).where("source = 'src3'").count()
        assert got == 5000 // 8
