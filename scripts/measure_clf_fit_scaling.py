#!/usr/bin/env python
"""One-off scaling check for fit_hashed_logodds: does the FIT wall stay
parameter-bounded as the labeled corpus grows 1x -> 16x -> 64x?

Scoring scale is already measured (SCALE.md r13 addendum 5: 2.4x wall
at 16x corpus). The fit side's only non-aggregate cost is the two O(1)
scalar collects (class totals) plus the O(n_buckets) model output —
both bounded by PARAMETERS, not rows — so the fit wall should grow only
with the token-count aggregate (near-linear scan, partial-aggregated to
n_buckets rows before the one exchange), never with a collect.

Letters-only salts keep replicas token-disjoint (the digit-salt lesson
from measure_scaling.py); labels are deterministic (doc_id % 3 == 0) so
both classes stay populated at every factor.

Run solo: python scripts/measure_clf_fit_scaling.py
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
FACTORS = (1, 16, 64)
N_BUCKETS = 4096


def main() -> None:
    s = get_spark(
        "clf-fit-scale", cpus=8, shuffle_partitions=16, driver_memory="16g"
    )
    from w4h_integrated_toolkit_spark.operators.text import fit_hashed_logodds

    docs = ensure_min_partitions(
        read_parquet(s, f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    )
    results = {}
    for f in FACTORS:
        frame = (
            replicate_salted(docs, f)
            .withColumn("label", F.col("doc_id") % 3 == 0)
            .repartition(16)
            .localCheckpoint(eager=True)
        )
        n_docs = frame.count()
        walls = []
        for _ in range(3):  # best-of-3 warm
            t0 = time.monotonic()
            n_rows = fit_hashed_logodds(
                frame, label="label", n_buckets=N_BUCKETS
            ).count()
            walls.append(time.monotonic() - t0)
        assert n_rows == N_BUCKETS + 1, n_rows  # model stays O(B)
        results[f"{f}x"] = {
            "labeled_docs": n_docs,
            "model_rows": n_rows,
            "sec": round(min(walls), 2),
        }
        print(f"-- {f}x: {results[f'{f}x']}", file=sys.stderr)
        frame.unpersist()
    s.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
