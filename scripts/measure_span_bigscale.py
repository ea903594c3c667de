#!/usr/bin/env python
"""One-off big-factor check for duplicated_spans: 16x and 64x salted
replication of the sf0.1 documents table (~80k and ~320k docs, ~3.5M
and ~14M k=10 window positions) — the heavier cousin of
measure_span_scaling.py, verifying the (h1, h2) stats exchange and the
per-doc island window hold their shape when position rows reach the
tens of millions rather than the hundreds of thousands.

Letters-only salts (base-26 suffix) keep replicas token-disjoint, so
true duplicated-span mass stays replica-local and linear in the factor.

Run solo: python scripts/measure_span_bigscale.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scale_common import replicate_salted  # noqa: E402

from w4h_integrated_toolkit_spark.catalog import (  # noqa: E402
    ensure_min_partitions,
    read_parquet,
)
from w4h_integrated_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get(
    "W4H_SCALE_SF_DIR",
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
)
FACTORS = (16, 64)


def main() -> None:
    s = get_spark(
        "span-bigscale", cpus=32, shuffle_partitions=32, driver_memory="16g"
    )
    from w4h_integrated_toolkit_spark.operators.dedup import duplicated_spans

    docs = ensure_min_partitions(
        read_parquet(s, f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    )
    results = {}
    for f in FACTORS:
        frame = replicate_salted(docs, f).repartition(32).localCheckpoint(
            eager=True
        )
        n_docs = frame.count()
        # warm the code paths once at the smaller factor only
        for arm, kw in (("exact", {}), ("stride8", {"stride": 8})):
            t0 = time.monotonic()
            n = duplicated_spans(frame, k=10, **kw).count()
            dt_s = round(time.monotonic() - t0, 2)
            results[f"{f}x_{arm}"] = {
                "docs": n_docs,
                "intervals": n,
                "sec": dt_s,
            }
            print(f"-- {f}x {arm}: {results[f'{f}x_{arm}']}", file=sys.stderr)
        frame.unpersist()
    s.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
