"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is materialized through the noop datasource sink — the full plan
executes (nothing pruned because nothing is observed), no bytes hit disk and
no rows cross to the driver, so the number is engine time, not IO/pickle
time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feature_store_ml_spark import queries as catalog  # noqa: E402
from feature_store_ml_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "e3_join_broadcast",
    "e3_join_asof",
    "e4_cube",
    "e5_window_rank",
    "e6_topk",
    "e9_dedup_exact",
    "e9_dedup_minhash",
    "e10_knn_brute",
    "e11_text_stats",
    "e11_tfidf",
    "e12_rolling_features",
    "e12_sessionize",
    "e13_session_window",
    "e14_resize_meta",
    "e15_feature_transformers",
    "q10_returned_items",
    "q17_small_quantity",
    "q18_large_orders",
    # round-2 joiners (first pins recorded in BASELINE.md round-2 section)
    "q6_forecast_revenue",
    "q8_market_share",
    "q21_sole_late_supplier",
    "e11_pii_scan",
    # round-4 joiners (first pins recorded in BASELINE.md round-4 section)
    "q11_important_parts",
    "q12_shipping_delay",
    "q13_customer_distribution",
    "q16_parts_supplier_relationship",
    "e10_knn_quantized",
    "e12_pit_multi",
    "e16_mixture_sample",
    # round-5 joiners (first pins recorded in BASELINE.md round-5 section):
    # lakehouse write paths — these bench the MERGE rewrite and the Iceberg
    # append + snapshot-diff, not just reads
    "e12_feature_upsert",
    "e1_iceberg_snapshot_diff",
    "e1_delta_partitioned",
    "e1_delta_partitioned_merge",
    "e1_delta_delete_vectors",
    "e1_iceberg_time_travel",
    # round-5 late joiners: stats-based data skipping on both formats
    # (bench covers write-with-stats + pruned read end-to-end)
    "e1_delta_data_skipping",
    "e1_iceberg_data_skipping",
    "e1_iceberg_partition_transforms",
    # round-6 joiners (first pins recorded in BASELINE.md round-6 section):
    # streaming source tail, ID-mode write lifecycle, schema evolution,
    # and distributed scan planning at an inflated file count
    "e13_stream_from_delta",
    "e1_delta_id_mode",
    "e1_iceberg_evolution",
    "e1_prune_planning",
    # round-6 late joiners (first pins in BASELINE.md round-6-late
    # section): zero-rewrite type widening, UPDATE on both formats
    # (copy-on-write vs single-snapshot merge-on-read), and the
    # partitioned streaming tail
    "e1_delta_type_widening",
    "e1_iceberg_type_widening",
    "e1_delta_update",
    "e1_iceberg_update",
    "e13_stream_from_delta_partitioned",
    "e11_chunking",
    # round-6 continuation joiners (first pins in BASELINE.md): selective
    # overwrite backfill, Iceberg rollback lifecycle, Iceberg MoR MERGE
    "e1_delta_replace_where",
    "e1_iceberg_rollback",
    "e1_iceberg_merge",
    "e1_convert_cross_format",
    "e1_convert_with_deletes",
    "e1_delta_row_tracking",
    "e11_bm25_search",
    "e12_interpolate",
    "e1_metadata_tables",
    "e1_delta_row_dml",
    "e12_scd2",
    "e1_iceberg_wap",
    "e18_drift_psi",
    "e1_delta_uniform",
    # round-8 joiners (first pins in BASELINE.md round-8 section): Puffin
    # NDV statistics lifecycle with a stats-driven broadcast join, the
    # native JPEG decode leg (5000 images through the pure-python T.81
    # path), and the Delta ANALYZE + incremental sketch-merge lifecycle
    "e1_iceberg_puffin",
    "e14_jpeg_decode",
    "e1_delta_analyze",
    # round-9 joiners (first pins in BASELINE.md round-9 section): AVRO
    # data-file lifecycle (partitioned write + rename + field-id read),
    # the three-format union table (ORC+AVRO+parquet across a rename),
    # and the progressive JPEG bit-parity leg (5000 images encoded both
    # ways, decoded both ways, checksum-compared)
    "e1_iceberg_avro",
    "e1_iceberg_multiformat",
    "e14_jpeg_progressive",
    # round-10 joiners (first pins in BASELINE.md round-10 section):
    # merge-on-read UPDATE+MERGE on an AVRO data table (same-format
    # replacement staging), and the streaming tail over AVRO data files
    # (spool materialization)
    "e1_iceberg_rowfmt_dml",
    "e13_stream_iceberg_avro",
    # round-11 joiners (first pins in BASELINE.md round-11 section):
    # Iceberg v3 row lineage through MoR DML on AVRO files, the full
    # mutation matrix CDF stream, incremental OPTIMIZE on both formats
    # (file-selection policy + partial rewrite), and the persisted IVF
    # serving lifecycle (build + append + two query batches)
    "e1_iceberg_row_lineage",
    "e13_stream_iceberg_cdf",
    "e1_optimize_incremental",
    "e1_iceberg_optimize_incremental",
    "e10_ivf_index",
    "e1_iceberg_v3_dv",
    "e1_uniform_v3",
    # round-12 joiners (first pins in BASELINE.md round-12 section):
    # v3 column defaults across three file generations, the CDF stream
    # spanning a column rename (materialized leg), and the v3 puffin-DV
    # mutation matrix under Structured Streaming
    "e1_iceberg_v3_defaults",
    "e13_stream_delta_cdf_rename",
    "e13_stream_iceberg_v3_cdf",
    # round-13 joiners (first pins in BASELINE.md round-13 section):
    # the nested-type lifecycle (struct/list/map write + rename + MoR
    # delete + list aggregate), the embedding feature group (Iceberg
    # materialize + GDPR retract + ANN off the lakehouse read), and the
    # v3 variant read lifecycle (register shredded variant parquet +
    # DV delete + rename + variant_get aggregate)
    "e1_iceberg_nested",
    "e12_feature_embeddings",
    "e1_iceberg_variant",
    # round-13 late joiners: Delta variant WRITE lifecycle (feature
    # protocol at create, two generations, DV delete on a variant_get
    # predicate), and the inner struct-member rename lifecycle (write
    # nested -> rename meta.lab -> append -> MoR delete -> aggregate on
    # the renamed member across generations)
    "e1_delta_variant",
    "e1_iceberg_inner_rename",
    # round-14 joiners (first pins in BASELINE.md round-14 section): the
    # distributed footer fid-map probe at an inflated path count (the
    # scan path's last serial-driver loop, now a mapInPandas job +
    # agreement hard-fail against the driver evaluator), and the v3
    # variant WRITE lifecycle (shredded staging, one-job count backfill,
    # DV delete on variant_get, rename via merged name mapping)
    "e1_footer_probe_planning",
    "e1_iceberg_variant_write",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    q = catalog.queries()
    # JVM/codegen warm-up on the smallest query so q1 doesn't pay session
    # startup; not counted.
    q["e6_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # page-cache warm-up, also not counted: BASELINE.md pins are
    # warm-cache best-of-N by definition, but the driver regenerates the
    # corpus right before benching, so each table's FIRST reader used to
    # pay the cold-disk touch — a disk-cache-state measurement, not an
    # engine one (the r8/r9 e9-family >1.45x readings were exactly this;
    # idle best-of-5 re-measures sat at 0.80x of pin both times). One
    # full noop scan per table makes every timed reading warm-cache,
    # like-for-like with the pins.
    import glob as _glob

    for _t in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        spark.read.parquet(_t).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        # steady-state timing: first run pays one-off JIT/codegen compilation
        # (~6s for the decimal/hash-heavy plans) that amortizes to zero in
        # any real workload; report the better of two runs.
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
