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

__all__ = ["hll_cube", "hll_rollup"]


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
