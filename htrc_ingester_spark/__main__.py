"""CLI: ``python -m htrc_ingester_spark <job> [args]`` (or the same
file via ``spark-submit --py-files engine.zip``).

Jobs mirror the reference's entry points (SURVEY.md §3):

- ``flagship``      — the north-star pipeline (encode → PIP → tile →
  agg) over a testdata SF dir; prints row count + timings.
- ``ingest``        — one-shot delta-log drain into a snapshot
  (IngestService phase 2): --dlog-dir --snapshot-dir --checkpoint-dir.
- ``verify``        — phase-3 re-verification of a manifested store:
  --store-dir --partition-col.
- ``knn``           — k nearest images to a point: --lon --lat --k.
- ``keys``          — enumerate a versioned table's keys (KeyLister
  parity / S10): --table-dir [--key-col --version --limit].
- ``revert``        — walk a versioned table back to --version and
  optionally un-verify partitions of a manifested store so they re-run
  (tools/RevertDeltaLogs.java:604-710 parity): --table-dir --version
  [--invalidate-store --partitions a,b].
- ``catalog``       — list every registered query (the public API
  surface).

Each job prints ONE JSON line (machine-readable, like bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="htrc_ingester_spark")
    sub = ap.add_subparsers(dest="job", required=True)

    p = sub.add_parser("flagship")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    p = sub.add_parser("ingest")
    p.add_argument("--dlog-dir", required=True)
    p.add_argument("--snapshot-dir", required=True)
    p.add_argument("--checkpoint-dir", required=True)

    p = sub.add_parser("verify")
    p.add_argument("--store-dir", required=True)
    p.add_argument("--partition-col", default="bucket")

    p = sub.add_parser("knn")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--lon", type=float, required=True)
    p.add_argument("--lat", type=float, required=True)
    p.add_argument("--k", type=int, default=5)

    sub.add_parser("catalog")

    p = sub.add_parser("keys")
    p.add_argument("--table-dir", required=True)
    p.add_argument("--key-col", default="volume_id")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--limit", type=int, default=100)

    p = sub.add_parser("revert")
    p.add_argument("--table-dir", required=True)
    p.add_argument("--version", type=int, required=True)
    p.add_argument(
        "--invalidate-store", default=None,
        help="manifested output dir whose partitions should re-run",
    )
    p.add_argument(
        "--partitions", default="",
        help="comma-separated partition ids to invalidate (with "
        "--invalidate-store); omit to invalidate ALL partitions",
    )

    p = sub.add_parser("pip")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument(
        "--polygons", required=True,
        help="polygon file: .geojson/.json FeatureCollection, or text "
        "with one 'poly_id<TAB>WKT' per line",
    )
    p.add_argument("--res", type=int, default=7)

    p = sub.add_parser("compact")
    p.add_argument("--table-dir", required=True)
    p.add_argument("--target-file-mb", type=int, default=128)

    p = sub.add_parser("expire")
    p.add_argument("--table-dir", required=True)
    p.add_argument("--keep-last", type=int, default=2)

    args = ap.parse_args(argv)

    if args.job == "expire":
        # pure metadata+rm, no Spark session needed
        from . import tables as TB

        expired = TB.expire_snapshots(args.table_dir, keep_last=args.keep_last)
        print(json.dumps({"job": "expire", "expired_versions": expired}))
        return 0

    if args.job == "catalog":
        from .plans import catalog

        oracles = set(catalog.oracle_sql())
        out = {
            "queries": sorted(catalog.queries()),
            "n": len(catalog.queries()),
            "with_oracle": len(oracles),
        }
        print(json.dumps(out))
        return 0

    if args.job == "revert":
        # pointer walk-back is pure metadata; Spark only spins up if
        # manifests need invalidating (tools/RevertDeltaLogs.java parity)
        from . import tables as TB

        v = TB.revert(args.table_dir, args.version)
        dropped = 0
        if args.invalidate_store:
            from . import manifest as M
            from .session import get_spark as _gs

            parts = [p for p in args.partitions.split(",") if p != ""]
            parts = [int(p) if p.lstrip("-").isdigit() else p for p in parts]
            # no --partitions = invalidate ALL (an empty list would
            # silently invalidate nothing and defeat the revert's point)
            dropped = M.invalidate_partitions(
                _gs("cli-revert"), args.invalidate_store, parts or None
            )
        print(json.dumps({"job": "revert", "now_at_version": v,
                          "manifests_invalidated": dropped}))
        return 0

    from .session import get_spark

    spark = get_spark(f"cli-{args.job}")
    t0 = time.monotonic()

    if args.job == "flagship":
        from .plans import flagship

        df = flagship.flagship(spark, args.sf_dir)
        rows = df.count()
        print(json.dumps({"job": "flagship", "rows": rows,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
    elif args.job == "ingest":
        from .streaming import incremental as I

        I.run_incremental_merge(spark, args.dlog_dir, args.snapshot_dir, args.checkpoint_dir)
        snap = I.read_snapshot(spark, args.snapshot_dir)
        n = snap.count() if snap is not None else 0
        print(json.dumps({"job": "ingest", "snapshot_rows": n,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
    elif args.job == "verify":
        from . import manifest as M

        fails = M.verify_manifests(spark, args.store_dir, args.partition_col).count()
        print(json.dumps({"job": "verify", "failed_partitions": fails,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
        return 1 if fails else 0
    elif args.job == "keys":
        # KeyLister.java parity: enumerate store keys (S10 full key scan)
        from . import tables as TB

        df = TB.read(spark, args.table_dir, version=args.version)
        keys = [r[0] for r in df.select(args.key_col).distinct()
                .orderBy(args.key_col).limit(args.limit).collect()]
        print(json.dumps({"job": "keys", "n_listed": len(keys), "keys": keys,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
    elif args.job == "knn":
        import pandas as pd

        from .operators.knn_join import knn_join_many
        from .plans import flagship

        points = flagship.load_images(spark, args.sf_dir)
        q = spark.createDataFrame(
            pd.DataFrame({"query_id": ["q0"], "lon": [args.lon], "lat": [args.lat], "k": [args.k]})
        )
        rows = [
            {"image_id": r.image_id, "dist_m": round(r.dist_m, 1), "rank": r.rank}
            for r in knn_join_many(spark, points, q).collect()
        ]
        print(json.dumps({"job": "knn", "neighbors": rows,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
    elif args.job == "pip":
        # real-user entry: shapefile-derived polygons (WKT/GeoJSON) in,
        # per-polygon image counts out
        from pyspark.sql import functions as F

        from .geo import wkt as W
        from .operators.pip_join import pip_join
        from .plans import flagship

        joined = None
        n_polygons = None
        img = flagship.load_images(spark, args.sf_dir)
        if args.polygons.endswith((".geojson", ".json")):
            polys = W.polys_from_geojson_file(args.polygons)
        elif args.polygons.endswith(".parquet"):
            # GeoParquet arrival: a binary WKB geometry column next to
            # an id column. Prefer the conventional names, fall back
            # to the only candidate, and fail with a usable message
            # rather than an arbitrary pick or a bare StopIteration.
            from .geo.wkb import polys_from_wkb_column
            from .operators.pip_join import _TABLE_POLYS_BUDGET, pip_join_table

            gdf = spark.read.parquet(args.polygons)
            binaries = [
                f.name for f in gdf.schema.fields if f.dataType.typeName() == "binary"
            ]
            strings = [
                f.name for f in gdf.schema.fields if f.dataType.typeName() == "string"
            ]
            wkb_col = next(
                (n for n in ("geometry", "wkb", "geom") if n in binaries),
                binaries[0] if len(binaries) == 1 else None,
            )
            id_col = next(
                (n for n in ("poly_id", "id", "fid", "name") if n in strings),
                strings[0] if len(strings) == 1 else None,
            )
            if wkb_col is None or id_col is None:
                raise SystemExit(
                    f"{args.polygons}: could not pick a WKB geometry column "
                    f"(binary candidates: {binaries or 'none'}) and a string "
                    f"id column (candidates: {strings or 'none'}); rename to "
                    "the geometry/poly_id convention or reduce to one "
                    "candidate of each type"
                )
            n_polygons = gdf.count()
            if n_polygons > _TABLE_POLYS_BUDGET:
                # the 10^6-parcel path: the cover-as-table regime runs
                # WKB-native — hand it the raw binary column; decode
                # happens inside the executor kernels and the polygon
                # set never round-trips through the driver
                joined = pip_join_table(
                    spark,
                    img,
                    gdf.select(
                        F.col(id_col).cast("string").alias("poly_id"),
                        F.col(wkb_col).alias("wkb"),
                    ),
                    res=args.res,
                )
            else:
                polys = polys_from_wkb_column(gdf, id_col=id_col, wkb_col=wkb_col)
        else:
            with open(args.polygons) as fh:
                rows = [ln.rstrip("\n").split("\t", 1) for ln in fh if ln.strip()]
            polys = W.polys_from_wkt(rows)
        if joined is None:
            n_polygons = len(polys)
            joined = pip_join(spark, img, polys, res=args.res)
        hits = (
            joined.groupBy("poly_id")
            .agg(F.count(F.lit(1)).alias("n_images"))
            .orderBy("poly_id")
            .collect()
        )
        print(json.dumps({
            "job": "pip", "n_polygons": n_polygons,
            "counts": {r["poly_id"]: r["n_images"] for r in hits},
            "wall_sec": round(time.monotonic() - t0, 3),
        }))
    elif args.job == "compact":
        from . import tables as TB

        v = TB.compact(spark, args.table_dir, target_file_mb=args.target_file_mb)
        print(json.dumps({"job": "compact", "new_version": v,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
