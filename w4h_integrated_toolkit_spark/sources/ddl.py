"""Config-driven DDL + catalog introspection (reference S13/S14).

The reference creates a PostgreSQL database per "W4H instance" with typed
tables generated from YAML config by string-eval of SQLAlchemy types
(script/w4h_db_utils.py:19-97) and lists instances via pg_database
(script/w4h_db_utils.py:100-123). Spark-side, an instance is a database of
parquet-backed tables whose schemas come from the same config shape
(catalog.DEFAULT_GEOMTS_CONFIG); constraints (composite PK, FK) have no
engine enforcement and become write-time invariants (dropDuplicates +
anti-join checks in operators.etl).

DDL strings are generated (not hand-written) so a config change re-derives
every table — the reference's best architectural idea kept intact.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from ..catalog import DEFAULT_GEOMTS_CONFIG, spark_type_for

__all__ = ["ddl_for_config", "create_instance", "list_tables"]

_FACT_COLS = "user_id STRING NOT NULL, `timestamp` TIMESTAMP NOT NULL, value DOUBLE"
_GEO_COLS = (
    "user_id STRING NOT NULL, `timestamp` TIMESTAMP NOT NULL, "
    "lon DOUBLE, lat DOUBLE, wkt STRING"
)


def ddl_for_config(
    config: dict[str, Any] | None = None,
    database: str = "w4h",
    base_path: str | None = None,
) -> list[str]:
    """CREATE DATABASE/TABLE statements for a GeoMTS instance.

    Series tables are date-partitioned (``dt DATE``) so time-range scans
    prune partitions — the physical layout decision that matters at 100 TB
    (catalog.write_fact_table writes this layout).
    """
    config = config or DEFAULT_GEOMTS_CONFIG
    loc = f" LOCATION '{base_path}/{{t}}'" if base_path else ""
    stmts = [f"CREATE DATABASE IF NOT EXISTS {database}"]

    attrs = config["subject_table"]["attributes"]
    cols = ", ".join(
        f"`{name}` {spark_type_for(t).simpleString().upper()}"
        + (" NOT NULL" if name == "user_id" else "")
        for name, t in attrs.items()
    )
    subject = config["subject_table"]["name"]
    stmts.append(
        f"CREATE TABLE IF NOT EXISTS {database}.{subject} ({cols}) USING parquet"
        + loc.format(t=subject)
    )
    for t in config["series_tables"]:
        stmts.append(
            f"CREATE TABLE IF NOT EXISTS {database}.{t} ({_FACT_COLS}, dt DATE) "
            f"USING parquet PARTITIONED BY (dt)" + loc.format(t=t)
        )
    for t in config.get("geo_tables", []):
        stmts.append(
            f"CREATE TABLE IF NOT EXISTS {database}.{t} ({_GEO_COLS}, dt DATE) "
            f"USING parquet PARTITIONED BY (dt)" + loc.format(t=t)
        )
    return stmts


def create_instance(
    spark: SparkSession,
    config: dict[str, Any] | None = None,
    database: str = "w4h",
    base_path: str | None = None,
) -> list[str]:
    """Execute the generated DDL (idempotent); returns the statements run.
    Analog of create_w4h_instance (w4h_db_utils.py:62-97)."""
    stmts = ddl_for_config(config, database, base_path)
    for s in stmts:
        spark.sql(s)
    return stmts


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """Catalog introspection (pg_database/pg_tables analog,
    w4h_db_utils.py:100-123): table names in ``database`` (or current)."""
    return [t.name for t in spark.catalog.listTables(database)]
