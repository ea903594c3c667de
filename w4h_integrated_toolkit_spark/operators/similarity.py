"""Similarity search over embedding columns (north-star ops).

- **cosine_topk** — exact brute-force top-k: query set broadcast against the
  corpus; dot products as JVM array expressions (zip_with + aggregate), no
  Python. At scale this is one map-side pass over the corpus + a top-k
  aggregate (no full sort).
- **lsh_topk** — the scale path: random-hyperplane LSH bucketing; queries
  only score candidates sharing a bucket, trading recall for a bounded
  candidate set. Hyperplanes are deterministic (seeded) literal arrays.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "lsh_topk",
    "neardup_pairs",
    "hyperplanes",
    "sign_bucket_key",
]


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold in double — deterministic and
    reproducible by the oracle's list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (small side) so the corpus is scanned once
    map-side; ranking via row_number over (query, score desc, id) — the id
    tiebreak makes results fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos", cosine(F.col("qv"), F.col("cv"))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes, inlined as literals on both the Spark and
    oracle sides so sign-LSH bucketing is engine-reproducible."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


_hyperplanes = hyperplanes  # back-compat alias


def sign_bucket_key(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one character per plane, '1' iff
    dot(vec, plane) >= 0. Pure map-side column expression."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-LSH blocking.

    Scale shape: one map-side bucket-key projection, ONE shuffle on the
    bucket key, pair generation confined to same-bucket candidates (recall
    trade: a pair is found only if no plane separates it — P ≈
    (1 - θ/π)^n_planes per pair), then exact cosine verification. At 100 TB
    the bucket shuffle replaces an O(n²) cross join; raise n_planes as n
    grows to keep buckets bounded, or band multiple keys for recall.
    Output: (id_a < id_b, cos ≥ threshold).
    """
    planes = hyperplanes(dim, n_planes, seed)
    b = df.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", sign_bucket_key(F.col("v"), planes))
    a_side = b.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b_side = b.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", "cos")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH.

    Bucket key = sign bits against ``n_planes`` hyperplanes; only same-bucket
    pairs are scored. At 100 TB: corpus bucketed once (map-side key compute +
    one shuffle on bucket), each query probes one bucket instead of the whole
    corpus. Recall < 1 by design; raise n_planes/bands for precision."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", sign_bucket_key(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", sign_bucket_key(F.col("qv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
