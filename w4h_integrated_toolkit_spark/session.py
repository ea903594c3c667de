"""SparkSession factory.

Scale posture: these configs are chosen so the same code runs on local[N]
for tests and on a large cluster unchanged:

- AQE on (runtime join re-planning, partition coalescing, skew-join splitting)
  so plans survive data-scale changes without manual retuning.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  AQE coalescing makes the initial number far less sensitive.
- Session timezone pinned to UTC: the GeoMTS data model treats timestamps as
  instants (reference stores naive UTC in PostgreSQL, w4h_db_utils.py:41-44),
  and the DuckDB oracle compares naive-UTC values.
- Arrow enabled for the pandas-UDF escape hatches (grouped calibration,
  geometry codecs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "prepare_session"]


def get_spark(
    app_name: str = "w4h-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # write timestamps as annotated INT64 (µs): INT96 is deprecated and
        # carries no parquet stats, which kills min/max file pruning
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # naive parquet timestamps are instants in this data model (session
        # tz pinned UTC above); NTZ inference would also break ts→double
        # epoch math used by window/gap operators
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prepare_session(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs on an externally-created session.

    The driver hands us its own SparkSession; timestamp semantics of every
    query depend on the session timezone, so pin it (runtime-settable) rather
    than trusting the ambient config.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # INT96 (the legacy default) writes NO footer min/max stats, silently
    # disabling the file/row-group pruning write_sorted exists to provide
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    # treat naive parquet timestamps as UTC instants, not NTZ (see get_spark)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark
