"""SURVEY §3.1 + north-star — the sensor-monitoring journey, engine-side.

The reference's core loop (viz.py dashboards over subject sensor data)
as one pipeline on the events table:

1. empirical daily P50/P95 bands per signal type (the data-driven
   version of the static safe bands),
2. time-weighted daily averages per subject (irregular sampling done
   right — a plain mean over-weights burst periods),
3. gap-filled minute grids with LOCF for one subject-day,
4. trailing z-score anomaly flags, batch...
5. ...and the SAME detector as a standing streaming query over a
   replayed event stream (bounded per-key state, exact batch equality),
6. double-count-free activity coverage + peak concurrency per subject
   (gaps-and-islands merge and the +1/−1 boundary sweep),
7. CUSUM mean-shift changepoints and Spearman monotonic-drift scores
   (which subjects' baselines moved, and when),
8. a MAD robust-outlier census per signal type.

Run: python examples/sensor_monitoring.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.catalog import read_parquet
from w4h_integrated_toolkit_spark.operators.timeseries import (
    gap_fill_minutes,
    rolling_zscore,
    time_weighted_avg,
)
from w4h_integrated_toolkit_spark.session import get_spark
from w4h_integrated_toolkit_spark.streaming.stateful import (
    streaming_anomaly_flags,
)

SF_DIR = os.environ.get("W4H_EXAMPLE_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example-sensors", cpus=4, shuffle_partitions=4)
    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")

    # --- 1. empirical daily bands per signal type ------------------------
    bands = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 2).alias("p95"),
    )
    print("daily bands (first 5):")
    for r in bands.orderBy("event_type", "day").limit(5).collect():
        print(" ", r["event_type"], str(r["day"])[:10], r["n"], r["p50"], r["p95"])

    # --- 2. time-weighted daily averages ---------------------------------
    twa = time_weighted_avg(ev, ts="ts", value="value", key="user_id")
    print("time-weighted daily averages:", twa.count(), "subject-days")

    # --- 3. gap-filled minute grid for one subject-day -------------------
    uid = ev.select("user_id").first()["user_id"]
    day = ev.filter(F.col("user_id") == uid).select(
        F.date_trunc("day", "ts").alias("d")
    ).first()["d"]
    one = ev.filter(
        (F.col("user_id") == uid)
        & (F.date_trunc("day", "ts") == F.lit(day))
    )
    grid = gap_fill_minutes(one, ts="ts", value="value", key="user_id")
    n_obs = grid.filter(F.col("is_observed") == 1).count()
    print(f"gap-filled grid for subject {uid}: {grid.count()} minutes, "
          f"{n_obs} observed")

    # --- 4. batch anomaly flags ------------------------------------------
    flags = rolling_zscore(ev, lookback=20, min_periods=5, threshold=3.0)
    batch_flags = sorted(map(tuple, flags.collect()))
    print("batch anomaly flags:", len(batch_flags))

    # --- 5. the same detector as a standing streaming query --------------
    stage = tempfile.mkdtemp(prefix="w4h_ex_sensor_")
    src = f"{SF_DIR}/events.parquet"
    os.symlink(os.path.abspath(src), os.path.join(stage, "events.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(stage)
    live = streaming_anomaly_flags(
        stream, lookback=20, min_periods=5, threshold=3.0
    )
    q = (
        live.writeStream.outputMode("append").format("memory")
        .queryName("ex_anomalies").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    stream_flags = sorted(map(tuple, spark.table("ex_anomalies").collect()))
    spark.catalog.dropTempView("ex_anomalies")
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    print("streaming anomaly flags:", len(stream_flags))
    assert stream_flags == batch_flags, "stream/batch detectors diverged"
    print("stream == batch: exact")

    # --- 6. activity coverage + peak concurrency -------------------------
    from w4h_integrated_toolkit_spark.operators.interval import (
        interval_coverage,
        max_concurrency,
    )

    s_us = F.round(F.col("ts").cast("double") * 1e6, 0).cast("long")
    iv = ev.select(
        "user_id",
        s_us.alias("start_us"),
        (s_us + F.lit(600_000_000)).alias("end_us"),
    )
    cov = interval_coverage(iv).orderBy(F.desc("covered_us")).first()
    peak = max_concurrency(iv).orderBy(F.desc("peak_concurrency")).first()
    print(
        f"most active subject {cov['user_id']}: "
        f"{cov['covered_us'] / 3.6e9:.1f}h across {cov['n_islands']} bouts; "
        f"max concurrency {peak['peak_concurrency']} (subject {peak['user_id']})"
    )

    # --- 7. changepoints + monotonic drift -------------------------------
    from w4h_integrated_toolkit_spark.operators.timeseries import (
        cusum_changepoint,
        spearman_trend,
    )

    cp = cusum_changepoint(ev).orderBy(F.desc("cusum_max")).first()
    tr = spearman_trend(ev).orderBy(F.desc(F.abs(F.col("spearman_rho")))).first()
    print(
        f"strongest mean shift: subject {cp['user_id']} "
        f"(CUSUM {cp['cusum_max']}); strongest drift: subject "
        f"{tr['user_id']} (rho {tr['spearman_rho']})"
    )

    # --- 8. robust outlier census ----------------------------------------
    from w4h_integrated_toolkit_spark.plans.queries import q_mad_outliers

    for r in q_mad_outliers(spark, SF_DIR).orderBy("event_type").collect():
        print(
            f"  {r['event_type']}: med={r['med']} mad={r['mad']} "
            f"outliers={r['n_outliers']}/{r['n']}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
