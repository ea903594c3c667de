"""Safe-band + breach histogram (SURVEY §2.4 A7/A8; viz.py:179-258).

The reference computes the band client-side then loops over ≤600 buckets in
Python; here both are two declarative aggregations: one scalar agg for the
band/span, one bucketized groupBy. The scalar frame is broadcast — the big
fact scan happens once, map-side, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["safe_band", "fixed_point_band", "breach_histogram", "alerts"]


def safe_band(df: DataFrame, value: str = "value", k: float = 2.0) -> DataFrame:
    """A8 (viz.py:192-196): band = mean ± k·stddev (sample) over ALL users."""
    return df.agg(
        (F.avg(value) - k * F.stddev_samp(value)).alias("band_lo"),
        (F.avg(value) + k * F.stddev_samp(value)).alias("band_hi"),
    )


def fixed_point_band(
    df: DataFrame, value: str = "value", k: float = 2.0, scale: float = 1e6
) -> DataFrame:
    """A8 band computed **bit-identically by construction** across engines.

    A plain float ``avg``/``stddev`` is partial-sum-order-dependent: Spark's
    parallel fold and a serial engine's fold can differ in the last ulp, and
    a band edge that lands next to a reading then classifies that reading
    differently — no amount of post-hoc rounding fixes a value that straddles
    the rounding boundary itself. Instead we make every step deterministic:

    1. per-row fixed-point quantize ``round(value*scale)`` (a correctly
       rounded double op — identical everywhere),
    2. exact integer sum S1 and sum-of-squares S2 (decimal(38,0) here,
       HUGEINT in the DuckDB twin — order-independent by exactness),
    3. one fixed sequence of correctly-rounded double ops:
       ``mean = S1/n/scale``;
       ``var = (n*S2 - S1²)/(n*(n-1))/scale²``;  ``band = mean ∓ k·sqrt(var)``.

    IEEE-754 guarantees each individual op (cast, /, sqrt, *, -) is
    correctly rounded, so identical inputs + identical op order ⇒ identical
    bits on any engine. SQL twin: ``_SQL_BAND_CTE`` in plans/queries.py.
    """
    sv = F.round(F.col(value) * F.lit(scale), 0).cast("decimal(38,0)")
    # count(value), not count(*): the sums skip NULL readings, so n must
    # count only the rows that contributed — count(*) would deflate both
    # mean and sigma whenever NULLs exist (matching avg/stddev_samp's
    # NULL-skipping, and count(value) in the SQL twin)
    s = df.agg(
        F.count(F.col(value)).alias("n"),
        F.sum(sv).alias("s1"),
        F.sum(sv * sv).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n / F.lit(scale)
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("s2") - F.col("s1") * F.col("s1")
    ).cast("double")
    var = num / (n * (n - F.lit(1.0))) / F.lit(scale * scale)
    std = F.sqrt(var)
    return s.select(
        (mean - k * std).alias("band_lo"), (mean + k * std).alias("band_hi")
    )


def breach_histogram(
    df: DataFrame,
    ts: str = "timestamp",
    value: str = "value",
    max_buckets: int = 600,
    min_bucket_seconds: float = 30.0,
    k: float = 2.0,
) -> DataFrame:
    """A7 (viz.py:237-258): split the observed time span into at most
    ``max_buckets`` buckets of at least ``min_bucket_seconds``; per bucket,
    the fraction of readings outside the safe band, and the reference's
    opacity ramp ``0.7*ratio + 0.2`` (viz.py:254).

    Plan shape: one scalar aggregate (span + band) cross-joined broadcast
    into the fact scan, then a hash aggregate on the bucket index.
    """
    # cast keeps sub-second precision and matches DuckDB's epoch() exactly
    e = F.col(ts).cast("double")
    scalars = df.agg(
        F.min(e).alias("t0"),
        F.max(e).alias("t1"),
        (F.avg(value) - k * F.stddev_samp(value)).alias("band_lo"),
        (F.avg(value) + k * F.stddev_samp(value)).alias("band_hi"),
    ).withColumn(
        "bucket_w",
        F.greatest((F.col("t1") - F.col("t0")) / max_buckets, F.lit(min_bucket_seconds)),
    )
    unsafe = (F.col(value) < F.col("band_lo")) | (F.col(value) > F.col("band_hi"))
    return (
        df.join(F.broadcast(scalars))
        .withColumn("bucket", F.floor((e - F.col("t0")) / F.col("bucket_w")).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(unsafe, 1).otherwise(0)).alias("n_unsafe"),
        )
        .withColumn("unsafe_ratio", F.col("n_unsafe") / F.col("n_total"))
        .withColumn("opacity", 0.7 * F.col("unsafe_ratio") + 0.2)
    )


def alerts(
    df: DataFrame,
    ts: str = "timestamp",
    value: str = "value",
    window_seconds: int = 60,
    ratio_threshold: float = 0.5,
    k: float = 2.0,
    band: DataFrame | None = None,
) -> DataFrame:
    """T9 (viz.py:38, ALERT_TIMEOUT=60): alert windows — fixed event-time
    windows where the fraction of readings outside the safe band exceeds
    ``ratio_threshold``.

    Same broadcast-scalars + hash-aggregate shape as breach_histogram, with
    epoch-aligned tumbling windows so the streaming variant (groupBy
    F.window) emits identical window keys. Output is the alert sink's
    schema: (window_start_epoch, n_total, n_unsafe, unsafe_ratio).

    Streaming: pass ``band`` precomputed from historical data (one scalar
    row) — a stream can't aggregate itself into its own predicate; the
    stream-static broadcast join is the standard calibration pattern.
    """
    e = F.col(ts).cast("double")
    if band is None:
        band = df.agg(
            (F.avg(value) - k * F.stddev_samp(value)).alias("band_lo"),
            (F.avg(value) + k * F.stddev_samp(value)).alias("band_hi"),
        )
    unsafe = (F.col(value) < F.col("band_lo")) | (F.col(value) > F.col("band_hi"))
    return (
        df.join(F.broadcast(band))
        .withColumn(
            "window_start_epoch",
            (F.floor(e / window_seconds) * window_seconds).cast("long"),
        )
        .groupBy("window_start_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(unsafe, 1).otherwise(0)).alias("n_unsafe"),
        )
        .withColumn("unsafe_ratio", F.col("n_unsafe") / F.col("n_total"))
        .filter(F.col("unsafe_ratio") > F.lit(ratio_threshold))
    )
