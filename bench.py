#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus the north-rule headline images_per_sec through
H3-encode → PIP-join → tile-assign}.

The flagship pipeline is the BASELINE.json metric: images/sec through
H3-encode → PIP-join → tile-assign. Scaling-efficiency evidence
(local[8] vs local[32]) lives in scripts/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline subset of the catalog: the north-star pipeline + its stages,
# kNN, and the relational/training-data throughput shapes
HEADLINE = [
    "flagship_pip_tiles",
    "h3_encode_hist",
    "tile_assign_hist",
    "pip_join_polygons",
    "knn_join_suppliers",
    "knn_join_distributed",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "a2_collect_sorted_list",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "similarity_topk_dot",
    "similarity_ann_lsh",
    "image_validate_pipeline",
    "cdc_merge_apply",
    "salted_collect_skewed",
    # VERDICT r3 #7: the heaviest operators rotate into the headline
    # set so their wall-times are tracked round-over-round
    "dedup_image_clusters",
    "raster_cost_distance",
    "similarity_pq_topk",
    # VERDICT r4 #6: rotate never-driver-sampled entries through the
    # headline set so the sampler eventually exercises them
    "ingest_pipeline_e2e",
    "zorder_layout_buckets",
    "events_funnel_stages",
    "pip_join_wkb_input",
    "pip_join_many_polys",
    # r5: the GeoParquet scale path end-to-end (distributed WKB decode
    # -> cover-as-table probe) tracked alongside its text/driver twins
    "pip_join_wkb_table",
    # r5 continued rotation of never-driver-sampled entries (VERDICT
    # r4 #6): event-time watermark window, grouping-sets cube, exact
    # phash radius search, OD matrix, quadkey encode
    "w4_event_time_window",
    "events_cube_rollup",
    "phash_search_radius",
    "trajectory_od_matrix",
    "quadkey_tile_hist",
    # r5 final rotation: eight more never-driver-sampled entries, each
    # sub-1.2 s at sf0.1 (probed before inclusion so the headline wall
    # stays comparable round-over-round)
    "events_type_pivot",
    "events_json_extract",
    "attribution_click_view",
    "trajectory_resample_ticks",
    "text_quality_full",
    "similarity_ann_multiprobe",
    "pip_join_convex_oracle",
    "coverage_gaps_rects",
    # r5 closing rotation: the LAST 22 never-driver-sampled entries —
    # with these, every catalog entry has either a driver CORRECTNESS
    # sample or a recorded headline wall+MAD. Each was probed first
    # (cold protocol, sf0.1); the six heavier ones (wkt-table twin,
    # cogroup refine shape, the dedup cluster/survivor/winnow family,
    # mutual-kNN) are included deliberately so the final bench records
    # the whole dedup pipeline, both table-regime refine shapes, and
    # the text-ingest twin. Headline TOTAL grows by construction;
    # r3_subset_total stays the round-over-round comparable number.
    "pip_join_wkt_table",
    "pip_join_table_cogroup",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_winnow_pairs",
    "dedup_image_phash",
    "knn_mutual_pairs",
    "similarity_ivf_topk",
    "segment_intersect_roads",
    "ring_metrics_polygons",
    "geofence_transitions_rects",
    "raster_isobands",
    "raster_gradient_slope",
    "tile_sample_topk",
    "segment_density_cells",
    "events_cohort_retention",
    "events_moving_avg",
    "events_value_ntile",
    "events_sliding_window",
    "adaptive_multires_hist",
    "events_value_anomalies",
    "zonal_buffer_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from htrc_ingester_spark.plans import catalog
    from htrc_ingester_spark.session import get_spark

    spark = get_spark("bench")
    qs = catalog.queries()

    # warm the JVM + parquet footer caches once (excluded from timings)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # noise discipline (VERDICT r2 #5): the host is ±30-50% run-to-run,
    # so each query gets 1 untimed warmup (plan compile, codegen JIT,
    # python-worker spawn — fixed costs a long-running cluster
    # amortizes) + n_runs timed reps; report the MEDIAN with the MAD as
    # the per-query noise bar. SPARK_GRAFT_BENCH_RUNS=1 for cold-ish
    # single-shot numbers.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    mads: dict[str, float] = {}
    n_images = 0
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warmup, untimed
        reps: list[float] = []
        for _ in range(n_runs):
            # cold-pipeline discipline: operators legitimately persist
            # shared intermediates (e.g. pip_join's candidate set) and
            # successive invocations of the same query canonicalize to
            # the same cache entry — without this, reps 2..n would
            # measure a cache read, not the H3-encode→PIP-join→tile
            # pipeline the headline metric claims. Same protocol as
            # scripts/scaling_bench.py.
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            reps.append(time.monotonic() - t0)
        reps.sort()
        med = reps[len(reps) // 2] if n_runs % 2 else (
            reps[n_runs // 2 - 1] + reps[n_runs // 2]
        ) / 2
        timings[name] = round(med, 3)
        mads[name] = round(
            sorted(abs(r - med) for r in reps)[len(reps) // 2], 3
        )
        if name == "flagship_pip_tiles":
            # images/sec denominator = full input cardinality (every
            # image is H3-encoded and probed, matched or not)
            n_images = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
            flagship_sec = timings[name]

    total = round(sum(timings.values()), 3)
    # round-over-round comparability: round 4 (a) rotated three heavy
    # iterative entries into HEADLINE and (b) switched to the
    # cold-pipeline protocol (clearCache per rep — r3 reps for
    # cache-reusing entries measured a cache READ). The r3-comparable
    # number is the PINNED 16-query subset total (the r3 HEADLINE
    # verbatim — entries rotated in later must not inflate it).
    r3_subset = [
        "flagship_pip_tiles", "h3_encode_hist", "tile_assign_hist",
        "pip_join_polygons", "knn_join_suppliers", "knn_join_distributed",
        "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
        "a2_collect_sorted_list", "dedup_exact_hash", "dedup_minhash_lsh",
        "similarity_topk_dot", "similarity_ann_lsh",
        "image_validate_pipeline", "cdc_merge_apply", "salted_collect_skewed",
    ]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_mad": mads,
        "runs_per_query": n_runs,
        "r3_subset_total": round(sum(timings[q] for q in r3_subset), 3),
        "protocol": "cold-pipeline (clearCache before every timed rep)",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "images_per_sec_flagship": round(n_images / flagship_sec, 1) if n_images else None,
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
