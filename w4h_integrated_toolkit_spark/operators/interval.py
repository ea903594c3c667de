"""Temporal join operators: as-of join and non-equi interval join.

The reference has no temporal joins (SURVEY §2.3 note) — these are the
standard time-series extensions (cf. kdb+ aj, TimescaleDB/DuckDB ASOF,
Flink interval join) re-expressed in shuffle-aware Spark plans:

- **asof_join** — "latest right row at or before each left row, per key"
  via the union trick: tag both sides, union, one window pass carrying the
  last-seen right payload forward, keep left rows. ONE shuffle+sort on
  (key, ts) total — never a per-row range probe or a join explosion. At
  100 TB this is the only as-of shape that scales: the sort is the same
  (key, ts) order the fact tables are already laid out in, so with
  bucketed/sorted storage the exchange disappears entirely.
- **interval_join** — points-in-intervals without an equi key, via bucket
  binning: intervals explode to the coarse time buckets they cover, points
  map to their single bucket, equi-join on bucket, then the exact range
  predicate filters in-row. Join fan-out is O(intervals x
  ceil(len/bucket)), never the O(points x intervals) cartesian a naive
  non-equi join plans. A point lives in exactly one bucket, so no
  pair-dedup pass is needed. Pick ``bucket_seconds`` ~ the typical
  interval length (each interval then covers <= 2 buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "interval_join",
    "merge_intervals",
    "interval_coverage",
    "max_concurrency",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row joined to the most recent right row
    with ``right.ts <= left.ts`` in the same ``on`` group (DuckDB/kdb+ ASOF
    semantics, equal timestamps match). Left rows keep all their columns;
    the matched right row contributes ``prefix + ts`` and ``prefix + c`` for
    each requested column; no match => nulls (left-join semantics).

    Right-side ties on (key, ts) resolve deterministically to the maximum
    payload (struct order) — not by pre-aggregating the right side, which
    would cost its own exchange, but by adding the payload to the window
    sort key so ``last()`` lands on the max. The whole operator is ONE
    exchange + sort over the union.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    ref_struct = F.struct(
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    r = right.select(
        on, F.col(ts), ref_struct.alias("_ref"), F.lit(1).alias("_is_ref")
    )
    ref_type = r.schema["_ref"].dataType
    payload = [c for c in left.columns if c not in (on, ts)]
    l_ = left.select(
        on,
        F.col(ts),
        F.lit(None).cast(ref_type).alias("_ref"),
        F.lit(0).alias("_is_ref"),
        F.struct(*[F.col(c) for c in payload]).alias("_row"),
    )
    r_ = r.select(on, ts, "_ref", "_is_ref", F.lit(None).cast(l_.schema["_row"].dataType).alias("_row"))
    # at equal ts every ref sorts before any left row (_is_ref desc), so
    # "<=" matches; among same-ts refs, _ref asc puts the max last, which
    # is exactly the row last() carries forward
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_is_ref").desc(), F.col("_ref").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_ref", ignorenulls=True).over(w)
    out = (
        l_.unionByName(r_)
        .withColumn("_carried", carried)
        .filter(F.col("_is_ref") == 0)
    )
    return out.select(
        on,
        F.col(ts),
        *[F.col("_row").getField(c).alias(c) for c in payload],
        F.col(f"_carried.{prefix}{ts}"),
        *[F.col(f"_carried.{prefix}{c}") for c in right_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 600,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval containing them
    (``start <= ts < end``), optionally also matching on ``equi_keys``.

    Returns one row per (point, interval) pair with both sides' columns
    (name collisions other than the equi keys must be resolved upstream).
    """
    equi_keys = equi_keys or []
    wsec = float(bucket_seconds)
    p = points.withColumn(
        "_bucket", F.floor(F.col(ts).cast("double") / wsec).cast("long")
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("double") / wsec).cast("long"),
                F.floor(F.col(end).cast("double") / wsec).cast("long"),
            )
        ),
    )
    cond = (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    return (
        p.join(iv, ["_bucket", *equi_keys])
        .filter(cond)
        .drop("_bucket")
    )


def _checked_start(start: str, end: str) -> Column:
    """``start``, verified ``start <= end`` row-by-row inside codegen.

    The check rides on the start VALUE (when/otherwise, not a detached
    assert column) so column pruning can never optimize it away; an
    inverted interval fails the job with a clear message instead of
    producing negative coverage or phantom concurrency drops.
    """
    return (
        F.when(F.col(start) <= F.col(end), F.col(start))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"inverted interval: {start}="),
                    F.col(start).cast("string"),
                    F.lit(f" > {end}="),
                    F.col(end).cast("string"),
                )
            )
        )
        .alias(start)
    )


def merge_intervals(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Merge overlapping/touching per-key intervals into maximal islands
    (gaps-and-islands): intervals sharing a point, or abutting exactly
    (``next.start == prev.end``), coalesce. ``start``/``end`` must be
    integer columns (epoch µs longs — exact, so "touching" is well-defined;
    float endpoints would make the island boundary an ulp lottery).

    Returns one row per island: (key, island start, island end).

    Plan: ONE exchange+sort on (key, start, end) shared by both window
    passes (running max-end lookback → new-island flag → running island
    ordinal) and by the final (key, island) aggregate — hash(key)
    clustering satisfies the coarser grouping, so Spark plans a single
    shuffle for the whole operator (the classic SQL-engine shape; at
    warehouse scale with (key, ts)-sorted storage the exchange vanishes).
    The per-key running state is O(1) per row — no interval self-join,
    no O(n²) overlap probe.

    Precondition: ``start <= end`` per row (half-open empty intervals are
    fine; inverted ones would silently corrupt island boundaries and
    yield negative covered spans). Enforced per row inside the scan
    stage: an inverted interval raises at execution time rather than
    flowing through as a phantom island.
    """
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(
        key,
        _checked_start(start, end),
        F.col(end),
        F.when(
            prev_max_end.isNull() | (F.col(start) > prev_max_end), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("_new_island"),
    )
    island = F.sum("_new_island").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("_island", island)
        .groupBy(key, "_island")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("_island")
    )


def interval_coverage(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Per-key coverage summary of a set of (possibly overlapping)
    intervals: how many disjoint islands they merge into and the total
    covered span — "how much wall-clock was this subject active, counting
    concurrent sessions once" (the reference's dashboards sum raw session
    lengths, double-counting overlaps; cf. viz.py activity panels). Exact
    integer µs in, exact integer µs out: no float ever enters, so the
    result is partition- and engine-invariant by construction.

    Same single-exchange plan as :func:`merge_intervals` (which it
    composes); the final per-key rollup again reuses the hash(key)
    clustering.
    """
    islands = merge_intervals(df, key, start, end)
    return islands.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col(end) - F.col(start)).alias("covered_us"),
    )


def max_concurrency(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Peak number of simultaneously open intervals per key, and the
    first instant attaining it — the classic +1/−1 boundary sweep
    (room-occupancy / concurrent-sessions question). Half-open [s, e)
    semantics: an interval ending exactly when another starts does NOT
    overlap it, enforced by processing −1 deltas before +1 at equal
    timestamps (the sort key, not a post-filter). ``start``/``end`` must
    be integer epoch-µs columns — exact ties, exact ordering, so the
    peak AND its timestamp are engine/partition-invariant.

    Plan: intervals explode to 2 boundary rows map-side; ONE exchange on
    the key drives the running-sum window and the max-of-struct argmax
    aggregate (same one-pass shape as cusum_changepoint — no join-back).

    Precondition: ``start <= end`` per row, enforced like
    :func:`merge_intervals` — an inverted interval would close before it
    opens and silently depress the concurrency count.
    """
    bounds = df.select(
        F.col(key),
        F.explode(
            F.array(
                F.struct(
                    _checked_start(start, end).alias("t"), F.lit(1).alias("d")
                ),
                F.struct(F.col(end).alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("b"),
    ).select(key, F.col("b.t").alias("_t"), F.col("b.d").alias("_d"))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t"), F.col("_d"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = bounds.select(
        key, F.col("_t"), F.sum("_d").over(w).alias("_open")
    )
    peak = F.max(F.struct(F.col("_open"), (-F.col("_t")).alias("_neg_t")))
    return (
        run.groupBy(key)
        .agg(peak.alias("_p"))
        .select(
            key,
            F.col("_p._open").alias("peak_concurrency"),
            (-F.col("_p._neg_t")).alias("peak_at_us"),
        )
    )
