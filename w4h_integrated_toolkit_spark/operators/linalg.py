"""Distributed linear algebra over embedding columns: the dense-matrix
aggregates a training-data pipeline runs ahead of PCA/whitening/feature
normalization. Reference parity: the reference has no embedding surface
at all (pandas/Streamlit health dashboards); these extend the engine's
LLM-data-pipeline layer alongside ``similarity.py``'s ANN arms.

Design rule (same as ``graph.pagerank_fixed_point`` /
``similarity.kmeans_iteration``): quantize components to scaled int64 in
EXPRESSION space (Spark's round — half away from zero, matching DuckDB),
then do every product and sum in integer arithmetic. Partial sums per
Arrow batch via BLAS-shaped numpy int64 matmul are exact and associative,
so the merged Gram matrix is bit-identical under any partitioning — an
exactly oracle-able dense aggregate, where a float Gram would differ in
the last ulps per partition order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embedding_gram", "embedding_dim_stats"]

GRAM_SCALE = 10**6


def _quantized(vec_col: str, scale: int):
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(float(scale)), 0).cast("long"),
    )


def _clean(vectors: DataFrame, vec_col: str) -> DataFrame:
    """Exclude NULL vectors and vectors with NULL components: a None in
    the Arrow batch would crash the int64 matmul (object dtype), and a
    partially-null vector has no well-defined contribution. The filter
    is a codegen'd expression in the scan stage."""
    v = F.col(vec_col)
    return vectors.filter(
        v.isNotNull() & ~F.exists(v, lambda x: x.isNull())
    )


def embedding_gram(
    vectors: DataFrame,
    vec_col: str = "embedding",
    scale: int = GRAM_SCALE,
) -> DataFrame:
    """Upper-triangular Gram matrix G = Σ_r q_r q_rᵀ of the quantized
    corpus (q = round(x·scale) per component) — the d×d second-moment
    aggregate that seeds PCA / whitening / covariance estimation (center
    with ``embedding_dim_stats`` means downstream:
    Cov ∝ G/n − mean·meanᵀ).

    Plan: quantization is a codegen'd expression; each Arrow batch
    contributes one exact int64 ``QᵀQ`` partial (numpy integer matmul —
    d(d+1)/2 rows per batch, NOT per vector), and the only exchange is
    the (i, j)-keyed merge of those tiny partials — ~d²/2 · n_partitions
    rows total, independent of corpus size. The corpus itself never
    shuffles.

    Overflow bound (documented contract, same style as pagerank):
    per-batch partial ≤ (scale·max|x|)² · batch_rows; at the default
    scale 1e6 with |x| ≤ 4 and 10k-row Arrow batches that is ~1.6e17,
    and the global per-cell sum stays int64-safe up to ~5·10⁵ corpus
    rows per unit of (scale·max|x|)² — drop ``scale`` to 1e3 for
    billion-row corpora (the Gram is then exact at the coarser
    quantization, still bit-stable). The bound is ENFORCED, not just
    documented: per Arrow batch the kernel raises before a partial
    could wrap, and the cross-batch merge is shadow-summed in double
    precision in-plan, raising on any cell whose int64 sum wrapped.
    """
    qdf = _clean(vectors, vec_col).select(
        _quantized(vec_col, scale).alias("_q")
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf["_q"].tolist(), dtype=np.int64)
            # sound per-batch overflow guard: |Σ_batch q_i q_j| is bounded
            # by max|q|² · batch_rows; numpy int64 matmul would WRAP
            # silently past 2^63, so raise before computing (2^62 leaves
            # headroom for the cross-batch merge — whose bound is the
            # documented scale contract in the docstring)
            peak = int(np.abs(m).max()) if m.size else 0
            if peak and peak * peak * len(m) >= 2**62:
                raise ValueError(
                    f"embedding_gram: batch partial could overflow int64 "
                    f"(max|q|={peak}, rows={len(m)}) — lower `scale` "
                    f"(coarser quantization keeps the Gram exact)"
                )
            g = m.T @ m
            iu = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "g": g[iu],
                }
            )

    partials = qdf.mapInPandas(part, "i int, j int, g long")
    merged = partials.groupBy("i", "j").agg(
        F.sum("g").alias("g"),
        # double-precision shadow of the same merge: under ANSI mode
        # (this repo's session default) the int64 sum raises on its own,
        # but a non-ANSI deployment wraps SILENTLY past 2^63 — the
        # shadow sum cannot wrap either way. A
        # wrap shifts g by k·2^64 ≈ k·1.8e19 while the shadow's rounding
        # error stays ≤ ~ulp(2^63)·n_partials ≪ 1e15, so a 1e15 gap is
        # an unambiguous wrap signal. Turns the documented ~5e5-row
        # scale contract (docstring above) into a runtime raise instead
        # of a silently-wrong Gram — the cross-batch twin of the
        # per-batch guard in `part`.
        F.sum(F.col("g").cast("double")).alias("_g_shadow"),
    )
    overflow = F.abs(F.col("g").cast("double") - F.col("_g_shadow")) > F.lit(1e15)
    return merged.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.when(
            overflow,
            F.raise_error(
                F.concat(
                    F.lit("embedding_gram: cross-batch merge of Gram cell ("),
                    F.col("i").cast("string"),
                    F.lit(", "),
                    F.col("j").cast("string"),
                    F.lit(") overflowed int64 — lower `scale` (coarser "),
                    F.lit("quantization keeps the Gram exact)"),
                )
            ).cast("long"),
        )
        .otherwise(F.col("g"))
        .alias("g"),
    )


def embedding_dim_stats(
    vectors: DataFrame,
    vec_col: str = "embedding",
    scale: int = GRAM_SCALE,
) -> DataFrame:
    """Per-dimension corpus statistics of the quantized embeddings:
    (dim, n, min_q, max_q, sum_q, mean_q) — the feature-normalization
    pass (min-max scaling, mean centering) that precedes training or
    quantized-ANN index builds. mean_q floors toward −inf (exact integer
    division, same adjustment as ``similarity.kmeans_iteration``) so it
    is engine-exact for negative sums too.

    Plan: posexplode is map-side; ONE hash aggregate on the d-valued dim
    key with map-side partials — the classic fully-decomposable shape.
    """
    e = _clean(vectors, vec_col).select(
        F.posexplode(_quantized(vec_col, scale)).alias("dim", "_qx")
    )
    return (
        e.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_qx").alias("min_q"),
            F.max("_qx").alias("max_q"),
            F.sum("_qx").alias("sum_q"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.col("n").cast("long").alias("n"),
            "min_q",
            "max_q",
            F.col("sum_q").cast("long").alias("sum_q"),
            F.expr(
                "CAST(CASE WHEN sum_q >= 0 THEN sum_q DIV n "
                "ELSE -((-sum_q + n - 1) DIV n) END AS BIGINT)"
            ).alias("mean_q"),
        )
    )
