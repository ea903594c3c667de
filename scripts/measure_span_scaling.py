#!/usr/bin/env python
"""Scaling harness for the r13 library additions: duplicated_spans and
schedule_frontier.

- ``duplicated_spans``: replicas are token-salted (the measure_scaling
  discipline) so duplicated-span mass is replica-LOCAL and grows linearly
  with the factor — exact copies would make every window a cross-doc dup
  and measure the degenerate all-duplicated corpus instead of the plan.
  Expected shape: near-linear (position rows, the (h1,h2) aggregate and
  the per-doc island exchange are all linear in tokens). A stride=8 arm
  measures the content-defined sampling path (same plan, ~1/8 the
  exchange volume after the map-side filter).
- ``schedule_frontier``: URL volume grows over a FIXED 997-host space
  (the crawl shape: fetches grow much faster than hosts). The risk is
  the per-host window sort — per-host volume grows linearly, but with
  997 hosts >> 32 threads the sort parallelizes; expected near-linear
  wall with no skew cliff.

Runs solo at sf0.1; prints one JSON line. Usage:
``python scripts/measure_span_scaling.py``
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

# letters-only salts (THE shared rule): replica-local tokens ->
# replica-local duplicated spans -> linear true dup mass
from scale_common import replicate_salted  # noqa: E402

from w4h_integrated_toolkit_spark.catalog import (  # noqa: E402
    ensure_min_partitions,
    read_parquet,
)
from w4h_integrated_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("W4H_SCALE_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 2, 4, 8)
N_HOSTS = 997


def main() -> None:
    s = get_spark(
        "span-scaling", cpus=32, shuffle_partitions=32, driver_memory="16g"
    )
    docs = ensure_min_partitions(
        read_parquet(s, f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    )
    frames = {
        f: replicate_salted(docs, f).localCheckpoint(eager=True)
        for f in FACTORS
    }

    from w4h_integrated_toolkit_spark.operators.dedup import duplicated_spans
    from w4h_integrated_toolkit_spark.operators.web import schedule_frontier

    def _frontier(d):
        # fixed host space, per-host crawl delay 1..5s, priority column
        urls = d.select(
            F.concat(
                F.lit("https://dom"),
                (F.col("doc_id") % N_HOSTS).cast("string"),
                F.lit(".com/p/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("dom"),
                (F.col("doc_id") % N_HOSTS).cast("string"),
                F.lit(".com"),
            ).alias("host"),
            ((F.col("doc_id") % 5) + 1).cast("double").alias("crawl_delay"),
            (F.col("doc_id") % 100).alias("prio"),
        )
        return schedule_frontier(urls, order_col="prio").count()

    ops = {
        "duplicated_spans_k10": lambda d: duplicated_spans(d, k=10).count(),
        "duplicated_spans_k10_s8": lambda d: duplicated_spans(
            d, k=10, stride=8
        ).count(),
        "schedule_frontier": _frontier,
    }

    results: dict[int, dict[str, float]] = {}
    for f in FACTORS:
        row: dict[str, float] = {}
        for name, fn in ops.items():
            t0 = time.monotonic()
            n = fn(frames[f])
            row[name] = round(time.monotonic() - t0, 3)
            row[f"{name}_rows"] = n
        results[f] = row
        print(f"-- {f}x: {row}", file=sys.stderr)
    s.stop()
    print(json.dumps({f"{k}x": v for k, v in results.items()}))


if __name__ == "__main__":
    main()
