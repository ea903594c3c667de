"""Graph operators over edge DataFrames (beyond the reference's surface —
the dedup clustering in ``dedup.py`` covers connected components; this
module adds iterative link-analysis, the other graph shape a large-scale
data pipeline asks for, e.g. ranking event-type transition graphs or
source-citation graphs).

Design rule for iterative numeric algorithms in this engine: run the
iteration in INTEGER fixed point. A float power iteration sums partial
products in partition order, so two runs (or two engines) disagree in the
last ulps and no exact oracle can gate it; with ranks scaled to integers
and per-edge contributions floor-divided, every operation is associative
and the result is bit-identical everywhere — the same discipline as
``cusum_changepoint``'s integer CUSUM and ``ewma_smooth``'s dyadic
weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_fixed_point", "edges_from_event_sequence"]

PAGERANK_SCALE = 10**12


def edges_from_event_sequence(
    df: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    node: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Weighted transition edges from per-key event sequences: one edge
    (src, dst, weight=count) per observed consecutive pair — the
    event-flow graph (same lag shape as the ``event_transitions``
    registry query, factored for graph consumers). ONE exchange on the
    key for the lag window, one hash aggregate for the weights."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    pairs = df.select(
        F.lag(node).over(w).alias("src"), F.col(node).alias("dst")
    ).filter(F.col("src").isNotNull())
    return pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))


def pagerank_fixed_point(
    edges: DataFrame,
    n_nodes: int | None = None,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """PageRank by unrolled power iteration in integer fixed point:
    ranks are BIGINTs scaled by ``scale``; each step computes

        r'(i) = (100−d)·scale/(100·n)  +  d/100 · Σ_j ⌊r(j)·w_ji / out_j⌋

    with every product/division in int64 (floor semantics documented as
    part of the contract). Deterministic to the bit under any
    partitioning or engine, hence exactly oracle-able — see the module
    docstring for why a float power iteration is not. Dangling mass and
    the sub-ulp floor losses are dropped, not redistributed (ranks are a
    deterministic ORDERING signal, not a probability simplex).

    Overflow bound: r ≤ scale (1e12) and r·w needs r·w < 2^63, so the
    per-edge weight must stay under ~9·10⁶ at the default scale —
    validated against the edge frame cheaply via a codegen'd check on
    the join (weights beyond that: pre-divide weights and out-degrees by
    a common factor, which leaves w/out ratios unchanged).

    Plan: out-degrees are one hash aggregate; each unrolled iteration is
    one broadcast join of the (tiny: one row per NODE) rank frame onto
    the edge frame plus one hash aggregate on dst — the edge frame is
    scanned ``iterations`` times but never shuffled on anything except
    dst, and the rank frame stays broadcast-size by definition of
    "node". For web-scale node counts swap the broadcast for a
    dst-bucketed co-partitioned join; the arithmetic contract is
    unchanged.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")

    out = edges.groupBy("src").agg(F.sum("weight").alias("_out"))
    # guard the int64 product bound where the multiply actually happens:
    # rank mass is conserved (Σ shares ≤ Σ r), so r ≤ scale after every
    # step and r·w < 2^63 requires w ≤ (2^63−1)/(2·scale) (factor-2 slack)
    max_w = (2**63 - 1) // (2 * scale)
    checked_w = F.when(F.col("weight") <= F.lit(int(max_w)), F.col("weight")).otherwise(
        F.raise_error(
            F.lit(
                f"pagerank_fixed_point: edge weight exceeds {max_w} and the "
                "rank*weight product would overflow int64 — pre-scale weights"
            )
        )
    )
    e = edges.select("src", "dst", checked_w.alias("weight")).join(
        F.broadcast(out), "src"
    )
    if iterations > 1:
        # every unrolled iteration references the edge frame; without a
        # materialization Spark re-derives the whole upstream build
        # (e.g. the per-key lag window over raw events) once per
        # iteration. Checkpoint the EDGE AGGREGATE — edge-sized, not
        # event-sized — the same eager-materialization discipline as
        # timeseries.rollup_cascade's level cascade.
        e = e.localCheckpoint(eager=True)
    # derive the node set from the cheapest materialized relation that
    # carries every (src, dst): the checkpointed edge aggregate when it
    # exists. The node subtree is referenced by base AND the rank init,
    # and (pre-r16) each reference re-ran the whole upstream edge build —
    # with the unrolled-rank duplication below that multiplied to 2^k
    # upstream re-executions (the event_type_pagerank plan carried 32
    # parquet scans / 47 exchanges for 3 iterations; r16 measured the
    # fix at ~40% of the query's wall). src/dst values are identical in
    # `e` (the weight guard raises, it never drops rows).
    nodes_src = e if iterations > 1 else edges
    nodes = (
        nodes_src.select(F.col("src").alias("node"))
        .unionByName(nodes_src.select(F.col("dst").alias("node")))
        .distinct()
    )

    n_expr = (
        F.lit(int(n_nodes)) if n_nodes is not None else F.count(F.lit(1))
    )
    # all divisions are integer DIV: the products run past 2^53, where a
    # double-division round-trip silently loses the low bits
    base = nodes.groupBy().agg(n_expr.alias("_n")).select(
        F.expr(f"{(100 - damping_pct) * scale // 100} DIV _n").alias("_teleport"),
        F.expr(f"{scale} DIV _n").alias("_r0"),
    )
    ranks = nodes.crossJoin(F.broadcast(base)).select(
        "node", F.col("_r0").alias("rank_fp"), "_teleport"
    )
    for it in range(iterations):
        contrib = (
            e.join(
                F.broadcast(ranks.select(F.col("node").alias("src"), "rank_fp")),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                # integer floor division per edge — associative terms
                F.expr("(rank_fp * weight) DIV _out").alias("_share"),
            )
            .groupBy("node")
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = (
            ranks.select("node", "_teleport")
            # contrib is <= one row per node — broadcast by contract
            .join(F.broadcast(contrib), "node", "left")
            .select(
                "node",
                (
                    F.col("_teleport")
                    + F.expr(
                        f"({damping_pct} * coalesce(_in, 0L)) DIV 100"
                    )
                ).alias("rank_fp"),
                "_teleport",
            )
        )
        if it < iterations - 1:
            # linearize the unrolled lineage: rank_k feeds BOTH the next
            # contrib (broadcast) and the next outer join, so without a
            # per-round barrier the rank subtree doubles per iteration
            # (plan size and re-execution both ~2^k). The checkpointed
            # relation is node-sized by definition; the LAST round stays
            # lazy so the consumer's action materializes it once
            # (r16 measured: with the node-set fix above, 2.2 s → 1.34 s
            # deep-warm for event_type_pagerank at sf0.1).
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank_fp")
