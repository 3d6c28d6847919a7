"""S1 (remote tree-list scan) and S10 (full key scan / CLI `keys`) —
the two rows the round-2 verdict marked 'untested (trivial)': a real
pairtree fixture is listed by the recursive binaryFile scan, and the
keys subcommand enumerates a versioned table."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from htrc_ingester_spark import tables as TB
from htrc_ingester_spark.__main__ import main as cli_main
from htrc_ingester_spark.sources.filesystem import read_pairtree, write_pairtree


def test_tree_list_scan_finds_every_member_and_reports_missing(spark, tmp_path):
    ids = spark.createDataFrame(
        [("uc2.ark:/13960/t%d" % i,) for i in range(12)], "volume_id string"
    )
    root = str(tmp_path / "ptree")
    write_pairtree(
        ids.withColumn("content", F.encode(F.col("volume_id"), "utf-8")), root
    )
    # request the 12 written plus 2 absent ids
    req = ids.union(
        spark.createDataFrame([("uc2.ark:/13960/t98",), ("uc2.ark:/13960/t99",)],
                              "volume_id string")
    )
    found, missing = read_pairtree(spark, root, req)
    assert found.count() == 12
    assert {r.volume_id for r in missing.collect()} == {
        "uc2.ark:/13960/t98", "uc2.ark:/13960/t99"
    }
    # the tree list itself is recursive: every found path lives under root
    assert all(r.path.startswith("file:") and "/ptree/" in r.path
               for r in found.select("path").collect())


def test_cli_keys_lists_table_keys(spark, tmp_path, capsys):
    tdir = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(f"vol{i:03d}", i) for i in range(25)], "volume_id string, v int"
    )
    TB.commit(df, tdir, note="t")
    rc = cli_main(["keys", "--table-dir", tdir, "--limit", "10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, None)
    assert out["job"] == "keys" and out["n_listed"] == 10
    assert out["keys"] == [f"vol{i:03d}" for i in range(10)]


def test_cli_pip_wkt_and_geojson_agree(spark, tmp_path, capsys):
    """The `pip` subcommand ingests polygons from a WKT TSV or a
    GeoJSON FeatureCollection and produces identical per-polygon
    counts (the two interchange paths share the even-odd ring spec)."""
    import json as _json

    from htrc_ingester_spark import data

    wkt_path = tmp_path / "polys.wkt"
    wkt_path.write_text(
        "".join(f"{pid}\t{w}\n" for pid, w in data.polygons_holes_wkt())
    )
    gj_path = tmp_path / "polys.geojson"
    gj_path.write_text(_json.dumps(data.polygons_holes_geojson()))

    outs = []
    for path in (wkt_path, gj_path):
        rc = cli_main(
            ["pip", "--sf-dir", "/root/testdata/sf0.001", "--polygons", str(path)]
        )
        assert rc == 0
        line = [
            ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
        ][-1]
        outs.append(_json.loads(line))
    assert outs[0]["counts"] == outs[1]["counts"]
    assert outs[0]["n_polygons"] == 4
    assert all(v > 0 for v in outs[0]["counts"].values())


def test_cli_pip_geoparquet_conventional_columns(spark, tmp_path, capsys):
    """r5 review: the GeoParquet CLI path picks the conventional
    geometry/poly_id columns (not an arbitrary first match) and its
    counts equal the WKT path's."""
    import json as _json

    import pandas as pd

    from htrc_ingester_spark import data

    wkt_path = tmp_path / "polys.wkt"
    wkt_path.write_text(
        "".join(f"{pid}\t{w}\n" for pid, w in data.polygons_holes_wkt())
    )
    # extra string column 'notes' FIRST: a naive first-string-column
    # pick would join against the wrong id
    pq = pd.DataFrame(
        {
            "notes": [f"note-{i}" for i, _ in enumerate(data.polygons_holes_wkb())],
            "poly_id": [pid for pid, _ in data.polygons_holes_wkb()],
            "geometry": [wkb for _, wkb in data.polygons_holes_wkb()],
        }
    )
    pq_path = tmp_path / "polys.parquet"
    pq.to_parquet(pq_path)

    outs = []
    for path in (wkt_path, pq_path):
        rc = cli_main(
            ["pip", "--sf-dir", "/root/testdata/sf0.001", "--polygons", str(path)]
        )
        assert rc == 0
        line = [
            ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
        ][-1]
        outs.append(_json.loads(line))
    assert outs[0]["counts"] == outs[1]["counts"]


def test_cli_pip_geoparquet_ambiguous_columns_fail_clearly(spark, tmp_path):
    """r5 review: two unconventional string columns (or zero binary
    columns) must produce a usable error, not StopIteration or an
    arbitrary pick."""
    import pandas as pd
    import pytest

    from htrc_ingester_spark import data

    pq = pd.DataFrame(
        {
            "alpha": ["a"] * len(data.polygons_holes_wkb()),
            "beta": ["b"] * len(data.polygons_holes_wkb()),
            "blob": [wkb for _, wkb in data.polygons_holes_wkb()],
            "blob2": [wkb for _, wkb in data.polygons_holes_wkb()],
        }
    )
    pq_path = tmp_path / "ambiguous.parquet"
    pq.to_parquet(pq_path)
    with pytest.raises(SystemExit, match="could not pick"):
        cli_main(
            ["pip", "--sf-dir", "/root/testdata/sf0.001",
             "--polygons", str(pq_path)]
        )
