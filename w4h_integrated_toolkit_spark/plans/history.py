"""Query-history store (SURVEY §2.1 S12).

The reference pickles Streamlit session dicts per user into SQLite
(script/w4h_db_utils.py:239-275, init_user.py:17-29) and replays them into
the input form (viz.py:1238-1241). Engine-side the equivalent is an
append-only parquet table of JSON query specs — no pickles (opaque,
version-fragile, unreadable by other tools), no driver-local state:

    history table: (username, saved_at, name, spec_json)

Replay = deserialize spec_json back into ``FilterSpec`` objects and
compile (plans are data, not code). Append-only keeps writes atomic and
concurrent-safe; "latest per (username, name)" is a window over the log,
the same pattern as any CDC/log-compaction read.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cohort import FilterSpec

__all__ = ["save_query", "load_history", "latest_specs", "specs_from_json"]


def save_query(
    spark: SparkSession,
    path: str,
    username: str,
    name: str,
    specs: list[FilterSpec],
    extra: dict[str, Any] | None = None,
) -> None:
    """Append one history row. ``extra`` carries the non-filter parts of the
    reference's session dict (date range, time-of-day ranges, flags)."""
    payload = json.dumps(
        {"filters": [asdict(s) for s in specs], "extra": extra or {}},
        sort_keys=True,
    )
    row = [(username, name, payload)]
    (
        spark.createDataFrame(row, "username string, name string, spec_json string")
        .withColumn("saved_at", F.current_timestamp())
        .write.mode("append")
        .parquet(path)
    )


def load_history(spark: SparkSession, path: str, username: str) -> DataFrame:
    """All saved queries for a user, newest first (viz.py history list)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("username") == username)
        .orderBy(F.col("saved_at").desc())
    )


def latest_specs(
    spark: SparkSession, path: str, username: str, name: str
) -> tuple[list[FilterSpec], dict[str, Any]] | None:
    """Latest saved spec for (user, name), deserialized and ready to compile
    — log-compaction read: row_number over the append log."""
    w = Window.partitionBy("username", "name").orderBy(F.col("saved_at").desc())
    rows = (
        spark.read.parquet(path)
        .filter((F.col("username") == username) & (F.col("name") == name))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    if not rows:
        return None
    return specs_from_json(rows[0]["spec_json"])


def specs_from_json(payload: str) -> tuple[list[FilterSpec], dict[str, Any]]:
    d = json.loads(payload)
    specs = [FilterSpec(**f) for f in d.get("filters", [])]
    # JSON round-trips range tuples as lists; FilterSpec semantics want tuples
    for s in specs:
        if isinstance(s.value, list) and s.type in ("int", "float", "datetime"):
            s.value = tuple(s.value)
    return specs, d.get("extra", {})
