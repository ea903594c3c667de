"""SURVEY §3.3 — the ImportHub ETL journey, engine-side.

The reference's CSV->GeoMTS import (script/import_hub_main.py): fuzzy
column mapping, wide->narrow melt, composite-PK dedup, new-user anti-join,
then the scale-ready sink (date-partitioned parquet here; write_jdbc for
an existing W4H Postgres instance).

Run: python examples/import_etl.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.catalog import write_fact_table
from w4h_integrated_toolkit_spark.operators.etl import (
    fuzzy_map_columns,
    ingest_fact,
    melt,
    upsert_users,
)
from w4h_integrated_toolkit_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-etl", cpus=4, shuffle_partitions=4)

    # a "wide CSV" upload with messy vendor column names
    wide = spark.createDataFrame(
        [
            ("p1", "2016-08-01 12:00:00", 71.0, 1.2),
            ("p1", "2016-08-01 12:01:00", 72.0, 1.3),
            ("p1", "2016-08-01 12:01:00", 72.0, 1.3),  # duplicate reading
            ("p2", "2016-08-01 12:00:00", 64.0, 0.9),
        ],
        "`Patient Email` string, `Start_Time` string, "
        "`Heart Rate (bpm)` double, `calorie_burn` double",
    )

    # fuzzy inference of the canonical mapping (C9; threshold 60 like the
    # reference's fuzzywuzzy flow) — token-reordered names map too
    mapping = fuzzy_map_columns(
        wide.columns,
        {
            "user_id": "patient email",
            "timestamp": "start time timestamp date",
            "heart_rates": "heart rate bpm",
            "calories": "calorie burn",
        },
    )
    print("inferred mapping:", mapping)

    canon = wide.select(
        F.col(mapping["user_id"]).alias("user_id"),
        F.to_timestamp(F.col(mapping["timestamp"])).alias("timestamp"),
        F.col(mapping["heart_rates"]).alias("heart_rates"),
        F.col(mapping["calories"]).alias("calories"),
    )

    # wide -> narrow per-signal rows (the reference's per-column melt)
    narrow = melt(canon, ["user_id", "timestamp"], ["heart_rates", "calories"])

    # new-user detection against the existing subject table (J2)
    existing = spark.createDataFrame([("p2",)], "user_id string")
    new_users = upsert_users(canon, existing)
    print("new users to insert:", [r.user_id for r in new_users.collect()])

    # composite-PK dedup + date-partitioned, user/time-clustered sink
    hr = ingest_fact(
        narrow.filter(F.col("feature") == "heart_rates").drop("feature")
    )
    dest = tempfile.mkdtemp(prefix="w4h_etl_") + "/heart_rates"
    write_fact_table(hr, dest)
    back = spark.read.parquet(dest)
    print("heart_rates rows written:", back.count(), "(dup dropped)")
    print("partitions:", [r.dt.isoformat() for r in back.select("dt").distinct().collect()])
    spark.stop()


if __name__ == "__main__":
    main()
