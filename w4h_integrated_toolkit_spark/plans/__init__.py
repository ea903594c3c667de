"""Query registry: named (Spark plan, DuckDB oracle SQL) pairs."""

from .queries import QUERIES, oracle_sql, queries  # noqa: F401
