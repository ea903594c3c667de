"""w4h_integrated_toolkit_spark — a PySpark-native GeoMTS analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
USC-InfoLab/w4h-integrated-toolkit (reference snapshot at /root/reference) on
Apache Spark: DataFrame/SQL declarative plans optimized by Catalyst, Structured
Streaming for the replay/real-time path, and Arrow-batched pandas UDFs only
where built-in operators cannot express the semantics.

Layout
------
- ``session``    SparkSession factory tuned for local[N] and cluster use
- ``catalog``    config-driven GeoMTS catalog (YAML-shaped dict -> StructType),
                 plus loaders for the driver's TPC-H-ish test tables
- ``functions``  scalar Column helpers (METs, units, time-of-day, portable hash)
- ``operators``  cohort filters/joins, KPIs, time-series windows, safe-band,
                 dedup (exact/MinHash/n-gram), similarity search, text analysis,
                 ETL (melt/upsert/fuzzy mapping), geometry codecs
- ``streaming``  replay source (pacing/seek/loop) + windowed streaming KPIs
- ``plans``      the query registry consumed by ``__spark_entry__`` (driver
                 correctness gate: Spark vs DuckDB oracle)
"""

__version__ = "0.1.0"
