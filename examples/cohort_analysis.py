"""SURVEY §3.1 — the historical cohort-analysis journey, engine-side.

The reference dashboard's flow (viz.py: input_page -> results_page) as a
script: declare the cohort with FilterSpec (or an NL-parser payload via
spec_from_nl_payload), restrict facts by date + cohort semi-join, derive
METs, compute KPIs vs the control group and the safe band. Everything is
lazy until the final actions; Catalyst pushes the date filter into the
scan and broadcasts the cohort.

Run: python examples/cohort_analysis.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime as dt

from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.functions import mets
from w4h_integrated_toolkit_spark.operators.cohort import (
    FilterSpec,
    cohort_compare,
    cohort_semi_join,
    filter_users,
)
from w4h_integrated_toolkit_spark.operators.kpi import signal_stats
from w4h_integrated_toolkit_spark.operators.safeband import safe_band
from w4h_integrated_toolkit_spark.session import get_spark


def demo_tables(spark):
    """Tiny GeoMTS-shaped fixture (users + heart_rates + calories)."""
    users = spark.createDataFrame(
        [
            ("u1", 34, 72.0, "CA"),
            ("u2", 58, 91.0, "CA"),
            ("u3", 41, None, "WA"),  # null weight -> METs default 70 kg
            ("u4", 29, 65.0, "TX"),
        ],
        "user_id string, age int, weight double, state_of_residence string",
    )
    t0 = dt.datetime(2016, 8, 1, 12, 0, 0)
    hr, cal = [], []
    for u, base in (("u1", 70.0), ("u2", 80.0), ("u3", 65.0), ("u4", 75.0)):
        for m in range(60):
            hr.append((u, t0 + dt.timedelta(minutes=m), base + (m % 7)))
            cal.append((u, t0 + dt.timedelta(minutes=m), 1.0 + (m % 3) * 0.5))
    schema = "user_id string, timestamp timestamp, value double"
    return users, spark.createDataFrame(hr, schema), spark.createDataFrame(cal, schema)


def main() -> None:
    spark = get_spark("example-cohort", cpus=4, shuffle_partitions=4)
    users, heart_rates, calories = demo_tables(spark)

    # cohort: 30-50 year olds (null-tolerant, the reference default);
    # control: everyone (empty spec list)
    subjects = filter_users(users, [FilterSpec("age", "int", (30, 50))])
    date_lo, date_hi = "2016-08-01", "2016-08-02"
    in_range = heart_rates.filter(
        F.to_date("timestamp").between(F.lit(date_lo), F.lit(date_hi))
    )
    subj_hr = cohort_semi_join(in_range, subjects)

    # METs from calories + broadcast weight lookup (J3/C4/U1)
    cal_w = calories.join(
        F.broadcast(users.select("user_id", "weight")), "user_id", "left"
    )
    subj_mets = cohort_semi_join(
        cal_w.withColumn("value", mets(F.col("value"), F.col("weight"))), subjects
    )

    # KPIs vs control (A1/A2/J6) and the safe band (A8)
    kpis = cohort_compare(
        signal_stats(subj_hr), signal_stats(in_range), ["avg_value", "max_value"]
    )
    band = safe_band(in_range)

    print("subjects:", [r.user_id for r in subjects.select("user_id").collect()])
    print("KPIs vs control:", kpis.collect()[0].asDict())
    print("safe band:", band.collect()[0].asDict())
    print("subject METs sample:", subj_mets.select("user_id", "value").first())
    spark.stop()


if __name__ == "__main__":
    main()
