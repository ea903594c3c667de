"""Z-normalized time-series similarity + top-k (SURVEY §7 phase 5).

Which users' signals move together? The classic z-normalized similarity
(cf. the matrix-profile / UCR-suite literature in PAPERS.md) over
whole-series alignment: Pearson correlation of two series IS the cosine of
their z-normalized vectors, so the built-in ``corr`` aggregate computes it
in one pass — no explicit normalization stage, no UDF.

Plan shape (designed for the 100 TB case):
1. resample each user onto a shared time grid — ONE hash aggregate; this
   is also the dimensionality bound (b buckets), decoupling pair cost from
   raw series length;
2. self-join on bucket index — the only quadratic step, and it is
   bucket-local: each grid cell joins only users active in that cell;
3. ``corr`` per user pair over common buckets — partial-aggregatable,
   map-side combined;
4. per-user top-k by correlation via row_number (no global sort).

For cohort-scale user counts the bucket self-join is fine; for millions of
users, insert the sign-LSH blocking of ``similarity.neardup_pairs`` on the
bucket-mean vectors first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_grid", "user_similarity_topk"]


def resample_grid(
    df: DataFrame,
    ts: str = "ts",
    value: str = "value",
    key: str = "user_id",
    bucket_seconds: int = 21600,
) -> DataFrame:
    """(key, bucket, mean value) on a fixed epoch-aligned grid.

    Bucket means use the order-independent scaled-integer mean so the grid
    — and everything correlated from it — is bit-identical at any
    partition count (plain avg(double) is not)."""
    from .timeseries import stable_mean

    bucket = (F.floor(F.col(ts).cast("double") / bucket_seconds)).cast("long")
    return df.groupBy(F.col(key).alias("k"), bucket.alias("bucket")).agg(
        stable_mean(value).alias("v")
    )


def user_similarity_topk(
    df: DataFrame,
    k: int = 3,
    ts: str = "ts",
    value: str = "value",
    key: str = "user_id",
    bucket_seconds: int = 21600,
    min_common: int = 8,
) -> DataFrame:
    """Top-``k`` most-similar keys per key by z-normalized similarity
    (Pearson r) over the shared resample grid; pairs with fewer than
    ``min_common`` common buckets are dropped (correlation of a handful of
    points is noise). Ties break by neighbor id (deterministic)."""
    g = resample_grid(df, ts, value, key, bucket_seconds)
    a = g.select(F.col("k").alias("user_a"), "bucket", F.col("v").alias("va"))
    b = g.select(F.col("k").alias("user_b"), "bucket", F.col("v").alias("vb"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("user_a") != F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.corr("va", "vb").alias("r"),
            F.count(F.lit(1)).alias("n_common"),
        )
        .filter((F.col("n_common") >= min_common) & F.col("r").isNotNull())
    )
    w = Window.partitionBy("user_a").orderBy(F.col("r").desc(), F.col("user_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_a", "user_b", "rank", "r", "n_common")
    )
