"""CSV source/sink (reference S5/S9).

The reference reads wide CSVs with ``pd.read_csv`` (stream_sim.py:188-201,
script/import_hub_main.py:136) and exports with ``df.to_csv``
(viz.py:1156-1180) — single-process, whole-file. Here both directions are
distributed: the reader splits files across tasks and, given an explicit
schema, skips the extra inference pass (inference = a full scan; at 100 TB
always pass the catalog schema); the writer emits one part per partition so
export throughput scales with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_csv", "write_csv"]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Header-aware CSV read. With ``schema`` the file is split-scanned once
    with no inference job; without, Spark samples the file first (fine for
    interactive import, wrong for the 100 TB path)."""
    reader = spark.read.option("header", True)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV export sink (viz.py:1156-1180 semantics).

    ``single_file=True`` coalesces to one partition — only for small result
    frames (the reference's use case: KPI/export downloads). Large exports
    keep their partitioning; downstream readers glob the directory."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
