#!/usr/bin/env python
"""One-off scaling check for user_similarity_topk's sign-LSH blocking
arm (block_planes=): does the blocked wall stay near-LINEAR in the user
count while the unblocked block-Gram decomposition grows quadratically?

User replication: each replica offsets user_id AND shifts ts by a large
disjoint span, so cross-replica pairs share ZERO grid buckets — they are
dropped by min_common in both arms (no correlated mass grows
quadratically; the r13 salt lesson, time-shift edition). The unblocked
arm still PAYS for those never-emitted pairs — every user pair in a
(chunk_a, chunk_b) block inflates that block's dense Gram operands — so
its wall grows ~factor²; the blocked arm buckets temporally-disjoint
replicas apart (orthogonal centered vectors → independent sign bits)
and in-bucket work grows ~factor·U²/2^planes. planes rises with the factor, but must track the
NEIGHBOR-POOL density (each replica holds ~150 real neighbors), not the
total user count: a first run with planes=6 at 64x split the 150-user
pools into ~64 buckets and truncated top-k recall to 68% — planes=4
keeps recall while still cutting the in-bucket Gram work ~16x.

Base defaults to sf0.01 (NOT the usual sf0.1): the unblocked quadratic
term must stay runnable at the comparison factors. Run solo:
    python scripts/measure_tsim_blocking.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from w4h_integrated_toolkit_spark.catalog import read_parquet  # noqa: E402
from w4h_integrated_toolkit_spark.operators.tsim import (  # noqa: E402
    user_similarity_topk,
)
from w4h_integrated_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("W4H_SCALE_SF_DIR", "/root/testdata/sf0.01")
# unblocked measured only while the quadratic term is affordable;
# blocked carries the full 16x/64x claim
UNBLOCKED_FACTORS = (1, 4, 16)
BLOCKED_FACTORS = (1, 16, 64)
PLANES_AT = {1: 2, 4: 3, 16: 4, 64: 4}
SECONDS_PER_REPLICA_SHIFT = 10 * 365 * 86400  # a decade: bucket-disjoint


def replicate_users(df, factor):
    parts = [
        df.select(
            (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
            (
                F.col("ts")
                + F.make_interval(secs=F.lit(i * SECONDS_PER_REPLICA_SHIFT))
            ).alias("ts"),
            "value",
        )
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(
        "tsim-blocking-scale",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        driver_memory="16g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = read_parquet(spark, f"{SF_DIR}/events.parquet").select(
        "user_id", "ts", "value"
    )
    base.write.format("noop").mode("overwrite").save()  # page-cache warm

    results = {}
    for arm, factors in (
        ("unblocked", UNBLOCKED_FACTORS),
        ("blocked", BLOCKED_FACTORS),
    ):
        for factor in factors:
            df = replicate_users(base, factor)
            kw = dict(k=3, bucket_seconds=21600, min_common=8)
            if arm == "blocked":
                kw["block_planes"] = PLANES_AT[factor]
            # warm once at factor 1 so neither arm pays first-plan JIT
            runs = []
            for _ in range(2 if factor == 1 else 1):
                t0 = time.time()
                n = user_similarity_topk(df, **kw).count()
                runs.append(round(time.time() - t0, 2))
            results[f"{arm}_{factor}x"] = {
                "wall_sec": min(runs),
                "pairs_topk_rows": n,
                **(
                    {"planes": PLANES_AT[factor]}
                    if arm == "blocked"
                    else {}
                ),
            }
            print(f"# {arm} {factor}x: {min(runs)}s rows={n}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
