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

Every answer carries a DETERMINISTIC error bound: the sketch stores the
L2 norm of the dropped spectrum (``resid_l2`` = ‖x − x̂‖₂ by Parseval),
and a range sum over W buckets reports ``err_bound = sqrt(|W|) ·
resid_l2`` (Cauchy–Schwarz). The bound holds exactly for the
bucket-aligned range the sketch answers, which is what makes the
registry query (``fft_range_sum``) externally verifiable by a SQL
oracle: the oracle recomputes the exact bucket-aligned sum and asserts
the within-bound flag. Tests additionally verify (a) exact
reconstruction when the full spectrum is kept and (b) bounded relative
error under truncation against the exact aggregate.
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
            T.StructField("resid_l2", T.DoubleType()),
        ]
    )

    def sketch(pdf: pd.DataFrame) -> pd.DataFrame:
        vec = np.zeros(n_buckets)
        vec[pdf["bucket"].to_numpy()] = pdf["bsum"].to_numpy()
        spec = np.fft.rfft(vec)
        m = min(n_coeffs, len(spec))
        top = np.argsort(-np.abs(spec))[:m]
        top.sort()
        # Parseval: ||x - x̂||₂² = (1/n) Σ_dropped mult_k |c_k|², where
        # mult is 2 except for the DC (and, n even, Nyquist) bins that
        # appear once in the rfft half-spectrum
        mult = np.full(len(spec), 2.0)
        mult[0] = 1.0
        if n_buckets % 2 == 0:
            mult[-1] = 1.0
        energy = mult * np.abs(spec) ** 2
        resid_sq = float(energy.sum() - energy[top].sum()) / n_buckets
        return pd.DataFrame(
            {
                "key": [int(pdf[key].iloc[0])],
                "t0": [float(pdf["t0"].iloc[0])],
                "bucket_w": [float(pdf["bucket_w"].iloc[0])],
                "n_buckets": [n_buckets],
                "idx": [top.astype("int32").tolist()],
                "re": [spec[top].real.tolist()],
                "im": [spec[top].imag.tolist()],
                "resid_l2": [float(np.sqrt(max(resid_sq, 0.0)))],
            }
        )

    return bucketed.groupBy(key).applyInPandas(sketch, out_schema)


def approx_range_sum(
    sketch: DataFrame, start: float, end: float
) -> DataFrame:
    """Approximate ``sum(value) WHERE start <= ts < end`` per key, answered
    ENTIRELY from the sketch (the raw series is never scanned).

    Reconstruction is a sparse inverse rDFT: cost O(n_coeffs · n_buckets)
    per key, map-side only. Returns (key, approx_sum, err_bound) where
    ``err_bound = sqrt(hi - lo) · resid_l2`` is a DETERMINISTIC
    Cauchy–Schwarz bound on |approx_sum − exact bucket-aligned sum|: the
    answered range is the bucket-aligned [t0 + lo·w, t0 + hi·w) cover of
    [start, end), and the per-bucket reconstruction error vector has L2
    norm resid_l2 (Parseval over the dropped spectrum).
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("approx_sum", T.DoubleType()),
            T.StructField("err_bound", T.DoubleType()),
        ]
    )

    def reconstruct(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, sums, bounds = [], [], []
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
                bounds.append(
                    float(np.sqrt(max(hi - lo, 0)) * row.resid_l2)
                )
            yield pd.DataFrame(
                {"key": keys, "approx_sum": sums, "err_bound": bounds}
            )

    return sketch.mapInPandas(reconstruct, out_schema)
