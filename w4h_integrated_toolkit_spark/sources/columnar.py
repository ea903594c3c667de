"""Columnar interchange formats beyond parquet: ORC read/write.

The reference persists exclusively through Postgres and CSV; a
warehouse-grade engine additionally speaks the other mainstream columnar
format so it can ingest from (and hand off to) Hive/Trino estates without
a conversion pass. ORC gets the same treatment as this engine's parquet
path: explicit schema on read (no inference scan), predicate pushdown and
column pruning reach the ORC reader natively (Spark's OrcScan reports
PushedFilters exactly like parquet), and ZSTD compression by default.

Avro is deliberately absent: spark-avro is an external package and this
environment is locked — gate any future arm behind an import probe, the
same pattern as ``operators.multimodal``'s real codecs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_orc", "write_orc"]


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC read; with ``schema`` the footer-inference job is skipped (same
    100 TB rule as read_csv: always pass the catalog schema)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str = "zstd",
) -> None:
    """ORC write, one file per partition (throughput scales with
    executors), ZSTD-compressed by default."""
    df.write.mode(mode).option("compression", compression).orc(path)
