"""FFT-approximate range aggregates (SURVEY §2.4 A13).

The reference declares an external PostgreSQL extension ``fft_approximate``
— FFT-based approximation of aggregate range queries over series
(reference README.md:15) — as a toolkit component. This module is the
Spark-native counterpart as a precomputed-sketch table (SURVEY §4.3 item 5):

- **build_fft_sketch** — offline: bucketize each key's series onto a
  regular time grid (one hash aggregate), then per key keep only the
  ``n_coeffs`` largest-magnitude DFT coefficients of the bucket-sum vector
  (numpy FFT inside applyInPandas). Sketch size per key is O(n_coeffs),
  independent of series length — at 100 TB the sketch table is smaller
  than the data by the compression ratio and is the only thing range
  queries touch.
- **approx_range_sum** — online: reconstruct bucket sums from the sparse
  spectrum (inverse DFT at the kept coefficients) and sum the buckets
  overlapping [start, end). Error is bounded by the dropped spectral
  energy (Parseval), so smooth periodic series (diurnal wearable signals —
  the reference's domain) compress extremely well.

Both stages are distributed per key; nothing is collected to the driver.
No DuckDB oracle by nature (sketch output is approximate); tests verify
(a) exact reconstruction when the full spectrum is kept and (b) bounded
relative error under truncation against the exact aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["build_fft_sketch", "approx_range_sum"]


def build_fft_sketch(
    df: DataFrame,
    ts: str = "ts",
    value: str = "value",
    key: str = "user_id",
    n_buckets: int = 512,
    n_coeffs: int = 32,
) -> DataFrame:
    """Per-key FFT sketch of a time series.

    Plan: one scalar agg for the global grid (t0, bucket width), one hash
    aggregate onto (key, bucket) — the only full-data shuffle — then a
    grouped-map FFT per key over its ≤``n_buckets`` bucket sums. Output one
    row per key: grid params + sparse spectrum (idx/re/im arrays of length
    ``n_coeffs``).
    """
    import numpy as np

    e = F.col(ts).cast("double")
    span = df.agg(F.min(e).alias("t0"), F.max(e).alias("t1")).withColumn(
        "bucket_w", (F.col("t1") - F.col("t0")) / n_buckets + F.lit(1e-9)
    )
    bucketed = (
        df.join(F.broadcast(span))
        .withColumn(
            "bucket",
            F.least(
                F.floor((e - F.col("t0")) / F.col("bucket_w")).cast("int"),
                F.lit(n_buckets - 1),
            ),
        )
        .groupBy(key, "bucket")
        .agg(
            F.sum(value).alias("bsum"),
            F.first("t0").alias("t0"),
            F.first("bucket_w").alias("bucket_w"),
        )
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("t0", T.DoubleType()),
            T.StructField("bucket_w", T.DoubleType()),
            T.StructField("n_buckets", T.IntegerType()),
            T.StructField("idx", T.ArrayType(T.IntegerType())),
            T.StructField("re", T.ArrayType(T.DoubleType())),
            T.StructField("im", T.ArrayType(T.DoubleType())),
        ]
    )

    def sketch(pdf: pd.DataFrame) -> pd.DataFrame:
        vec = np.zeros(n_buckets)
        vec[pdf["bucket"].to_numpy()] = pdf["bsum"].to_numpy()
        spec = np.fft.rfft(vec)
        m = min(n_coeffs, len(spec))
        top = np.argsort(-np.abs(spec))[:m]
        top.sort()
        return pd.DataFrame(
            {
                "key": [int(pdf[key].iloc[0])],
                "t0": [float(pdf["t0"].iloc[0])],
                "bucket_w": [float(pdf["bucket_w"].iloc[0])],
                "n_buckets": [n_buckets],
                "idx": [top.astype("int32").tolist()],
                "re": [spec[top].real.tolist()],
                "im": [spec[top].imag.tolist()],
            }
        )

    return bucketed.groupBy(key).applyInPandas(sketch, out_schema)


def approx_range_sum(
    sketch: DataFrame, start: float, end: float
) -> DataFrame:
    """Approximate ``sum(value) WHERE start <= ts < end`` per key, answered
    ENTIRELY from the sketch (the raw series is never scanned).

    Reconstruction is a sparse inverse rDFT: cost O(n_coeffs · n_buckets)
    per key, map-side only. Returns (key, approx_sum).
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("approx_sum", T.DoubleType()),
        ]
    )

    def reconstruct(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, sums = [], []
            for row in pdf.itertuples(index=False):
                nb = int(row.n_buckets)
                spec = np.zeros(nb // 2 + 1, dtype=complex)
                spec[np.asarray(row.idx, dtype=int)] = np.asarray(
                    row.re
                ) + 1j * np.asarray(row.im)
                vec = np.fft.irfft(spec, n=nb)
                lo = int(np.floor((start - row.t0) / row.bucket_w))
                hi = int(np.ceil((end - row.t0) / row.bucket_w))
                lo, hi = max(lo, 0), min(hi, nb)
                keys.append(int(row.key))
                sums.append(float(vec[lo:hi].sum()) if hi > lo else 0.0)
            yield pd.DataFrame({"key": keys, "approx_sum": sums})

    return sketch.mapInPandas(reconstruct, out_schema)
