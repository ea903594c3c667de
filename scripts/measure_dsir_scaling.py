#!/usr/bin/env python
"""One-off scaling check for dsir_resample: does the SELECTION wall stay
TakeOrderedAndProject-shaped (per-partition k-heaps, NO global sort
exchange) as the candidate corpus grows 1x -> 16x -> 64x?

The fit side is already covered by the classifier-fit addendum (SCALE.md
r14: same two-bucket-aggregate shape, 3.4x wall at 64x docs). What this
measures is the resample itself: one feature_hashing aggregate over the
corpus + the O(n_buckets) broadcast model join + orderBy(key).limit(k).
If Spark planned the selection as a global sort, the tail would grow
super-linearly with rows and spill; with TakeOrderedAndProject (the
plan-pinned shape) the wall should track the near-linear scan/aggregate.

The model is fitted ONCE on the base corpus (target = en slice, raw =
even doc_ids) and reused at every factor — the selection measurement
must not re-pay the fit. Letters-only salts keep replicas token-disjoint
(the digit-salt lesson from measure_scaling.py); the weights still apply
because fit_dsir_logratios emits a weight row for EVERY bucket.

Run solo: python scripts/measure_dsir_scaling.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

# ONE copy of the salted-replication helpers (the letters-only-salt
# invariant — the digit-salt lesson — lives in scripts/scale_common.py)
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
N_BUCKETS = 1024
K = 1000


def main() -> None:
    s = get_spark(
        "dsir-scale", cpus=8, shuffle_partitions=16, driver_memory="16g"
    )
    from w4h_integrated_toolkit_spark.operators.text import (
        dsir_resample,
        fit_dsir_logratios,
    )

    docs = ensure_min_partitions(
        read_parquet(s, f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang", "text"
        )
    )
    w = fit_dsir_logratios(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("doc_id") % 2 == 0),
        n_buckets=N_BUCKETS,
    ).localCheckpoint(eager=True)

    results = {}
    for f in FACTORS:
        frame = (
            replicate_salted(docs.select("doc_id", "text"), f)
            .repartition(16)
            .localCheckpoint(eager=True)
        )
        n_docs = frame.count()
        walls = []
        for _ in range(3):  # best-of-3 warm
            t0 = time.monotonic()
            n_sel = dsir_resample(
                frame, w, k=K, n_buckets=N_BUCKETS
            ).count()
            walls.append(time.monotonic() - t0)
        assert n_sel == min(K, n_docs), n_sel
        results[f"{f}x"] = {
            "corpus_docs": n_docs,
            "selected": n_sel,
            "sec": round(min(walls), 2),
        }
        print(f"-- {f}x: {results[f'{f}x']}", file=sys.stderr)
        frame.unpersist()
    s.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
