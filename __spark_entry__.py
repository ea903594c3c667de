"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship cohort-KPI pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's query registry
(w4h_integrated_toolkit_spark.plans) — one entry per implemented operator
from SURVEY.md §2, each paired with the ANSI-SQL oracle DuckDB verifies it
against.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from w4h_integrated_toolkit_spark import plans

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the cohort-KPI pipeline
    (typed null-tolerant filters -> broadcast semi join -> grouped KPIs),
    the reference's main SELECT path (SURVEY §3.1)."""
    return plans.queries()["cohort_kpi"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
