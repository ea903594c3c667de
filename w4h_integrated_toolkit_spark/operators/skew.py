"""Skew mitigation: salted aggregation and salted joins (SURVEY §4.3).

AQE's skew-join splitting (on in session.py) handles most runtime skew; these
are the explicit tools for the cases AQE can't see:

- **two_stage_agg** — aggregation where a handful of hot keys would pin one
  reducer: stage 1 aggregates on (keys, salt) spreading each hot key over
  ``salt`` reducers, stage 2 merges the partials. Only decomposable
  aggregates qualify (sum/count/min/max — merge functions exist); avg is
  derived as sum/count downstream. Two small shuffles instead of one
  stalled one.
- **salted_join** — large⋈large equi-join with a skewed probe side:
  build side replicated ``salt`` times (explode over literal array, map-side
  — never a driver loop), probe side routed by a uniform salt. Routing salt
  is allowed to be nondeterministic (it only chooses WHICH copy matches;
  the join output is identical for any routing), so no seeded RNG is
  needed. Use when neither side broadcasts and AQE splitting is defeated
  (e.g. pre-shuffled/bucketed inputs).

Cost model: salting multiplies build-side shuffle volume by ``salt`` — use
the smallest salt that caps per-reducer hot-key volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_stage_agg", "salted_join"]

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_STAGE1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt: int = 32,
) -> DataFrame:
    """``aggs`` = [(column, fn, alias)] with fn in sum|count|min|max.

    Equivalent to ``df.groupBy(keys).agg(...)`` for any data; pays off when
    key frequencies are heavily skewed (hot key spread over ``salt``
    stage-1 reducers)."""
    bad = [fn for _, fn, _ in aggs if fn not in _STAGE1]
    if bad:
        raise ValueError(f"non-decomposable aggregate(s): {bad}")
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[_STAGE1[fn](c).alias(a) for c, fn, a in aggs]
    )
    return stage1.groupBy(*keys).agg(
        *[_MERGE[fn](a).alias(a) for _, fn, a in aggs]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side's hot keys spread over ``salt``
    partitions; the build side is replicated ``salt`` times to meet them.

    Semantically identical to ``probe.join(build, on, how)`` for inner and
    left joins (each probe row meets exactly one copy of each matching
    build row)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    probe_s = probe.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    build_s = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = probe_s.join(build_s, [on, "_salt"], how)
    return out.drop("_salt")
