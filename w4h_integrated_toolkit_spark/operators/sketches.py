"""Mergeable distinct-count sketch cubes (SURVEY §2.4 A9/A13 scale path).

The reference answers "how many distinct subjects/devices" questions with
exact ``COUNT(DISTINCT ...)`` over the raw tables (e.g. the subject and
session counts behind the dashboard's cohort summaries, viz.py's user
listings). Exact distinct is a full shuffle of every key occurrence — at
100 TB per query that is the single most expensive aggregate shape there
is, and it is NOT incrementally maintainable: yesterday's exact count
contributes nothing to today's.

The fleet-scale pattern is a **sketch cube**: pre-aggregate a mergeable
HyperLogLog sketch per (dimensions..., time-bucket) cell ONCE — one
shuffle of the raw data, same cost as any other cube build — then answer
every subsequent distinct-count query over ANY dimension slice and ANY
time range by merging cells (``hll_union_agg``), never touching raw data
again. Merge cost is O(cells × 2^lg_k) bytes, independent of row count.
New days append new cells; the cube is incrementally maintainable by
construction.

Spark 4 ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), all JVM-side aggregates with
map-side partials — no UDFs anywhere on this path.

Estimates are approximate (default lg_k=12 → ~1.6% standard error), so
there is no DuckDB value oracle; tests bound the relative error against
exact ``countDistinct`` and pin the merge identity (union of daily cells
== sketch of the whole range, within sketch error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_cube",
    "hll_rollup",
    "kll_cube",
    "kll_rollup",
    "theta_cube",
    "theta_rollup",
    "theta_overlap",
    "count_min_estimates",
    "cm_probe_longs",
    "persist_cube",
]


def hll_cube(
    df: DataFrame,
    dims: list[str],
    distinct_col: str,
    ts: str | None = "ts",
    bucket: str = "1 day",
    lg_k: int = 12,
) -> DataFrame:
    """Build the sketch cube: one HLL sketch of ``distinct_col`` per
    (dims..., time bucket) cell.

    ONE hash aggregate over the raw data (map-side partial sketches merge
    into reduce-side cells — the exchange carries sketch partials, not raw
    keys). ``ts=None`` builds a cube without a time dimension. Output:
    dims... [, bucket_start] , sketch (binary), n_rows (exact row count
    rides along for free — it makes the cube double as a plain rollup).
    """
    keys: list[Column | str] = list(dims)
    if ts is not None:
        keys.append(F.window(F.col(ts), bucket)["start"].alias("bucket_start"))
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup(cube: DataFrame, group_cols: list[str]) -> DataFrame:
    """Answer a distinct-count query from the cube alone: merge cell
    sketches up to ``group_cols`` (any subset of the cube's dimensions;
    apply time-range filters on ``bucket_start`` BEFORE calling — they
    prune cells, not raw data). Returns group_cols..., approx_distinct
    (long), n_rows (exact).

    This is the query-time path: its input is O(cells), so it runs in
    milliseconds at any raw-data scale — the raw table is never read.
    """
    merged = cube.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("_merged"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate(F.col("_merged")).alias("approx_distinct"),
        F.col("n_rows"),
    )


def kll_cube(
    df: DataFrame,
    dims: list[str],
    value_col: str,
    ts: str | None = "ts",
    bucket: str = "1 day",
    k: int = 200,
) -> DataFrame:
    """Mergeable QUANTILE sketch cube (KLL) — the scale path for the
    reference's percentile dashboards (viz.py's distribution panels; the
    exact twin is the ``percentiles`` registry query).

    Exact percentiles need a sort (or at best ``percentile()``'s full value
    shuffle) over every row in the slice, per query. The KLL cube pays one
    aggregate at build time — the exchange carries O(k) sketch partials per
    cell, not values — and then any (dimension slice × time range) quantile
    question is a cell merge: ``kll_merge_agg_double`` is associative and
    lossless-in-guarantee (rank error ~1.65/sqrt(k) stays bounded under
    merge). Raw data is never re-read; new days append cells.
    """
    keys: list[Column | str] = list(dims)
    if ts is not None:
        keys.append(F.window(F.col(ts), bucket)["start"].alias("bucket_start"))
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "sketch"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def kll_rollup(
    cube: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> DataFrame:
    """Answer quantile queries from the cube alone: merge cell sketches up
    to ``group_cols`` and extract ``quantiles``. Time/dimension filters
    applied to the cube BEFORE this call prune cells, never raw data.
    Output: group_cols..., fixed-width per-mille quantile columns
    (0.25 -> q_250, 0.5 -> q_500, 0.99 -> q_990; double), n_rows (exact)."""
    names = [f"q_{int(round(q * 1000)):03d}" for q in quantiles]
    if len(set(names)) != len(names):
        # per-mille naming collides for quantiles closer than 1e-3
        # (0.25 and 0.2501 would both become q_250) — duplicate output
        # columns are a silent downstream hazard, so refuse
        raise ValueError(
            f"quantiles {quantiles} collide at per-mille precision: {names}"
        )
    merged = cube.groupBy(*group_cols).agg(
        F.kll_merge_agg_double(F.col("sketch")).alias("_m"),
        F.sum("n_rows").alias("n_rows"),
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(q)).alias(name)
        for q, name in zip(quantiles, names)
    ]
    return merged.select(*group_cols, *qcols, F.col("n_rows"))


def persist_cube(
    cube: DataFrame, name: str, mode: str = "overwrite"
) -> None:
    """Store a sketch cube (hll/kll/theta) as a date-partitioned table:
    one partition per ``bucket_start`` day.

    This is the cube's STORAGE half of the 100 TB contract. Build once,
    then: (a) daily ingests append only the new day's cells
    (``mode='append'`` — rollup merges duplicate cells correctly because
    every sketch agg is associative, see
    test_hll_cube_incremental_append_equals_rebuild); (b) time-sliced
    rollups read back with a ``bucket_start`` filter PRUNE PARTITIONS at
    the scan — a month's question over a year's cube touches ~1/12 of the
    files (plan-asserted in test_persisted_cube_partition_prunes). The
    raw fact table is never re-read by either path.
    """
    (
        cube.withColumn("dt", F.to_date(F.col("bucket_start")))
        .write.format("parquet")
        .mode(mode)
        .partitionBy("dt")
        .saveAsTable(name)
    )


def theta_cube(
    df: DataFrame,
    dims: list[str],
    distinct_col: str,
    ts: str | None = "ts",
    bucket: str = "1 day",
) -> DataFrame:
    """Theta sketch cube: like ``hll_cube`` but supporting full SET ALGEBRA
    at query time. HLL only unions; Theta adds intersection and difference,
    so questions like "how many users were active in BOTH week 1 and week 2"
    (retention/overlap) are answerable from per-slice sketches without ever
    joining raw key sets — at 100 TB the exact form of that question is two
    distinct-aggregates plus a join of the key universes.
    """
    keys: list[Column | str] = list(dims)
    if ts is not None:
        keys.append(F.window(F.col(ts), bucket)["start"].alias("bucket_start"))
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(F.col(distinct_col)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def theta_rollup(cube: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge theta cells up to ``group_cols``, KEEPING the merged sketch so
    callers can feed the result to ``theta_overlap``. Output: group_cols...,
    sketch, approx_distinct, n_rows."""
    merged = cube.groupBy(*group_cols).agg(
        F.theta_union_agg(F.col("sketch")).alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        *group_cols,
        "sketch",
        F.theta_sketch_estimate(F.col("sketch")).alias("approx_distinct"),
        F.col("n_rows"),
    )


def theta_overlap(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """Set algebra between two sketch relations (each: on..., sketch —
    the shape ``theta_rollup`` emits), joined on ``on``: per group, the
    estimated |A|, |B|, |A∪B|, |A∩B|, |A\\B|, |B\\A|. Both inputs are
    O(groups) relations of sketch bytes; the join is trivially
    broadcast-able and raw data is never touched."""
    left = a.select(*on, F.col("sketch").alias("_sa"))
    right = b.select(*on, F.col("sketch").alias("_sb"))
    j = left.join(right, on)
    return j.select(
        *on,
        F.theta_sketch_estimate(F.col("_sa")).alias("n_a"),
        F.theta_sketch_estimate(F.col("_sb")).alias("n_b"),
        F.theta_sketch_estimate(F.theta_union(F.col("_sa"), F.col("_sb"))).alias(
            "n_union"
        ),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("_sa"), F.col("_sb"))
        ).alias("n_intersection"),
        F.theta_sketch_estimate(F.theta_difference(F.col("_sa"), F.col("_sb"))).alias(
            "n_only_a"
        ),
        F.theta_sketch_estimate(F.theta_difference(F.col("_sb"), F.col("_sa"))).alias(
            "n_only_b"
        ),
    )


def cm_probe_longs(raw: bytes, items: list[int]) -> list[int]:
    """Probe a serialized Spark ``count_min_sketch`` for long-typed items
    without the JVM: parse the stable v1 wire format (big-endian
    DataOutputStream: version i32, totalCount i64, depth i32, width i32,
    hashA long[depth], table long[depth][width]) and replay
    ``CountMinSketchImpl``'s Carter-Wegman long hash (stream-lib lineage:
    ``h = hashA[d]*item; h += h >> 32; h &= (2^31-1); bucket = h % width``,
    all in wrapping signed-64 arithmetic — numpy int64 matches Java
    exactly, verified against ``estimateCount`` over the full signed-64
    item range). Exists because py4j round-trips dominate when
    interrogating MANY sketches (a windowed CM stream emits one sketch
    per window: 720 windows x 8 candidates was ~2.5 s of py4j vs ~10 ms
    here). Returns ``min`` over depth rows per item — the CM estimate."""
    import struct

    import numpy as np

    version = struct.unpack_from(">i", raw, 0)[0]
    if version != 1:
        raise ValueError(
            f"cm_probe_longs: unsupported CountMinSketch serialization "
            f"version {version} (expected 1) — re-validate the wire "
            f"format against org.apache.spark.util.sketch"
        )
    depth, width = struct.unpack_from(">ii", raw, 12)
    hash_a = np.frombuffer(raw, dtype=">i8", count=depth, offset=20).astype(
        np.int64
    )
    table = (
        np.frombuffer(raw, dtype=">i8", count=depth * width, offset=20 + 8 * depth)
        .astype(np.int64)
        .reshape(depth, width)
    )
    its = np.array(items, dtype=np.int64)  # Java long domain by contract
    with np.errstate(over="ignore"):
        h = hash_a[:, None] * its[None, :]  # (depth, n) wrapping signed-64
        h = h + (h >> np.int64(32))
        h = h & np.int64((1 << 31) - 1)
        buckets = h % np.int64(width)
    est = table[np.arange(depth)[:, None], buckets].min(axis=0)
    return [int(v) for v in est]


def count_min_estimates(
    df: DataFrame,
    col: str,
    candidates: DataFrame | None = None,
    eps: float = 1e-3,
    confidence: float = 0.99,
    seed: int = 42,
    max_candidates: int = 65536,
) -> DataFrame:
    """Count-Min frequency estimates — the heavy-hitters side of the
    sketch family (HLL answers "how many distinct", KLL "what quantile",
    Theta "what overlap"; CM answers "how often does THIS value occur"
    in sub-linear space). One JVM-side mergeable aggregate builds the
    sketch (map-side partials, order/partition-invariant by counter
    additivity — Spark's native ``count_min_sketch``); the candidate
    values to interrogate come from ``candidates`` (production: a cheap
    sampled/grouped pass or a known watchlist), defaulting to
    ``distinct(col)`` CAPPED at ``max_candidates`` via a limit-probe that
    fails fast with an actionable error (same guard shape as the IVF
    centroid collect — CM is for when the DOMAIN is huge but the
    interrogated set is small; an unbounded distinct defeats it).

    Guarantee (one-sided): estimate ≥ true count always, and
    estimate ≤ true + ⌈eps·N⌉ with probability ≥ confidence. Returns
    (value, estimate) with the sketch deserialized ONCE driver-side —
    O(candidates) work, no per-row driver loop.
    """
    sk_row = df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("sk")
    ).first()
    cand_src = candidates if candidates is not None else df.select(col).distinct()
    cand_rows = cand_src.limit(max_candidates + 1).collect()
    if len(cand_rows) > max_candidates:
        raise ValueError(
            f"count_min_estimates: more than max_candidates={max_candidates} "
            "distinct values to interrogate; pass an explicit bounded "
            "`candidates` relation (a watchlist or sampled top set) — "
            "querying a CM sketch for an unbounded domain defeats its "
            "sub-linear purpose"
        )
    spark = df.sparkSession
    vals = sorted(r[0] for r in cand_rows)
    dtype = dict(df.dtypes)[col]
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        # integral items: probe the sketch bytes directly (no JVM)
        ests = cm_probe_longs(bytes(sk_row["sk"]), [int(v) for v in vals])
    else:
        # non-long items (strings hash via Murmur3 of the UTF-8 bytes):
        # keep the JVM probe — a single sketch with a bounded candidate
        # set is O(candidates) py4j calls, cheap at this call shape
        jvm = spark._jvm
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(sk_row["sk"]))
        )
        ests = [int(cms.estimateCount(v)) for v in vals]
    return spark.createDataFrame(
        list(zip(vals, ests)),
        f"{col} {dtype}, estimate long",
    )
