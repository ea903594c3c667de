#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query runs twice after a shared session warm-up and reports the
fastest run. This box shows intermittent multi-second hypervisor CPU-steal
windows (the same plan measures 0.9s or 58s depending on the minute);
min-of-N keeps the number a property of the engine rather than of the
neighbor's workload, while still including each plan's own codegen/compile
cost in the first run it could land in. When the two runs disagree sharply
(ratio > 2 — the steal signature; engine-noise between warm runs is far
smaller), the query is re-run up to 2 more times so a steal window spanning
both initial runs can't misreport a 3s plan as 30s (observed in round 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from w4h_integrated_toolkit_spark.plans import QUERIES
from w4h_integrated_toolkit_spark.session import get_spark

# Headline set: the relational spine + the heavy training-data ops.
BENCH_QUERIES = [
    "pricing_summary",
    "range_scan",
    "cohort_kpi",
    "shipping_priority",
    "local_supplier_volume",
    "mets_broadcast_lookup",
    "calibration",
    "breach_histogram",
    "stream_alerts",
    "resample_1min",
    "sliding_window",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "simhash",
    "knn_cosine_topk",
    "embedding_neardup_pairs",
    "byte_histogram",
    "text_stats",
    "language_id",
    "asof_latest_purchase",
    "incident_interval_join",
    "knn_ivf_topk",
    "rollup_cascade",
    "user_similarity_topk",
    "dedup_clusters",
    "session_windows",
    "retention_matrix",
    "big_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("w4h-bench", cpus=cpus, shuffle_partitions=cpus,
                      driver_memory="24g")

    # warm-up: JVM/codegen, parquet data + footer page cache for every bench
    # table, and the Python/Arrow worker pool (we measure the engine, not
    # JVM startup or cold storage — count() alone reads only footers)
    from w4h_integrated_toolkit_spark.catalog import read_parquet

    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "events", "documents", "embeddings"):
        read_parquet(spark, f"{sf_dir}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    warm = spark.range(cpus * 4).repartition(cpus)
    warm.groupBy("id").applyInPandas(lambda p: p, "id long").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _ = QUERIES[name]
        runs: list[float] = []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink: forces full computation of every output column
            # (count() would let Catalyst prune projections on map-only
            # queries)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        # steal-window guard: warm same-plan runs agree within ~2x on a
        # quiet box; a larger spread means at least one run ate hypervisor
        # CPU-steal, and the *other* may have too — re-run until two
        # measurements agree or the retry budget (2) is spent
        retries = 0
        while max(runs) > 2.0 * min(runs) and retries < 2:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            runs = sorted(runs)[:2]
            retries += 1
        timings[name] = round(min(runs), 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
