"""Crawl-stack scaling harness at 1x/2x/4x/8x (r12 verdict order #6):

- ``warc_extract``: the encode→parse round trip is LINEAR in payload
  bytes by design (every byte is decompressed and framed exactly once;
  the parallel unit is the blob) — this measures whether that linearity
  HOLDS at 8x or a super-linear term (tail copies, per-member realloc)
  has crept in.
- ``robots_filter``: the per-host rules dictionary is FIXED while the
  URL volume grows — the design claim is that the Python/Arrow parse
  cost is dictionary-bounded and the URL side is pure map-side Columns,
  so wall-clock should grow FAR slower than rows (the idna dict-pass
  shape). A fixed 997-host robots table (6 rules each) is matched
  against URLs synthesized from the replicated documents frame.

Deeper factors than measure_scaling.py's (1,2,4) because these two are
exactly the rows the 100 TB claim leans on; runs solo in ~3 min at
sf0.1. Usage: ``python scripts/measure_crawl_scaling.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from w4h_integrated_toolkit_spark.catalog import read_parquet  # noqa: E402
from w4h_integrated_toolkit_spark.session import get_spark  # noqa: E402

# W4H_SCALE_SF_DIR is the knob every measure_*.py harness honors;
# SPARK_GRAFT_SF_DIR kept as a fallback for bench-style invocations
SF_DIR = os.environ.get(
    "W4H_SCALE_SF_DIR",
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
)
FACTORS = (1, 2, 4, 8)
N_HOSTS = 997


def replicate_ids(df, factor):
    # id-offset replication only: both ops' cost is formula-/host-keyed,
    # not content-keyed, so text salting (measure_scaling.replicate) is
    # unnecessary here — doc_id shifts keep the id space disjoint
    parts = [
        df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    s = get_spark("crawl-scaling", cpus=32, shuffle_partitions=32,
                  driver_memory="16g")
    docs = read_parquet(s, f"{SF_DIR}/documents.parquet").select("doc_id")
    frames = {
        f: replicate_ids(docs, f).localCheckpoint(eager=True)
        for f in FACTORS
    }

    from w4h_integrated_toolkit_spark.operators.web import robots_filter
    from w4h_integrated_toolkit_spark.plans.queries import (
        _attach_warc_payload,
    )
    from w4h_integrated_toolkit_spark.sources.warc import warc_records

    # fixed robots dictionary: 997 hosts x 6 rules (wildcards, anchors,
    # an allow override and a crawl-delay — the realistic per-host mix)
    body = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/pub/\n"
        "Disallow: /*?session=\n"
        "Disallow: /tmp$\n"
        "Disallow: /caf%c3%a9\n"
        "Crawl-delay: 2\n"
    )
    robots = s.range(N_HOSTS).select(
        F.concat(F.lit("dom"), F.col("id").cast("string"), F.lit(".com"))
        .alias("host"),
        F.lit(body).alias("robots_txt"),
    ).localCheckpoint(eager=True)

    def _robots(d):
        # path variants lead with the rule-relevant prefix so every rule
        # class actually fires (review finding: a /p{M}/ prefix made 4
        # of the 6 rules dead weight and the fold near-trivial):
        # wildcard-query, allow-override precedence, plain disallow,
        # percent-equivalence (raw é vs the %-spelled rule), the '$'
        # anchor, and the no-match allow path
        m = F.pmod(F.col("doc_id"), F.lit(50)).cast("string")
        variant = (
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.lit("/s"), m, F.lit("?session=1")))
            .when(F.col("doc_id") % 7 == 1,
                  F.concat(F.lit("/private/pub/ok"), m))
            .when(F.col("doc_id") % 7 == 2,
                  F.concat(F.lit("/private/no"), m))
            .when(F.col("doc_id") % 7 == 3, F.lit("/café"))
            .when(F.col("doc_id") % 7 == 4, F.lit("/tmp"))
            .otherwise(F.concat(F.lit("/page"), m, F.lit("?a=1")))
        )
        urls = d.select(
            "doc_id",
            F.concat(
                F.lit("http://dom"),
                F.pmod(F.col("doc_id"), F.lit(N_HOSTS)).cast("string"),
                F.lit(".com"),
                variant,
            ).alias("url"),
        )
        # count the ALLOWED rows so the verdict fold cannot be pruned
        return robots_filter(urls, robots).where(F.col("allowed")).count()

    def _warc(d):
        return warc_records(_attach_warc_payload(d.select("doc_id"))).count()

    results: dict[int, dict[str, float | int]] = {f: {} for f in FACTORS}
    for name, fn in (("robots_filter", _robots), ("warc_extract", _warc)):
        for f in FACTORS:
            fn(frames[f])  # warm
            ts = []
            for _ in range(2):
                t0 = time.time()
                fn(frames[f])
                ts.append(time.time() - t0)
            results[f][name] = round(min(ts), 2)
            results[f]["rows"] = frames[f].count()

    print("factor | rows | robots_filter | warc_extract")
    base = results[1]
    for f in FACTORS:
        r = results[f]
        print(
            f"{f}x | {r['rows']} | {r['robots_filter']} s "
            f"({r['robots_filter'] / base['robots_filter']:.2f}x) | "
            f"{r['warc_extract']} s "
            f"({r['warc_extract'] / base['warc_extract']:.2f}x)"
        )
    s.stop()


if __name__ == "__main__":
    main()
