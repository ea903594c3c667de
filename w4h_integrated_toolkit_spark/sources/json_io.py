"""JSON micro-batch source (reference S6).

The reference's stream client GETs a JSON payload of three synchronized
row-batches — ``{heart_rates: [...], calories: [...], coordinates: [...]}``
(stream_sim.py:279-301) — and decodes each into a DataFrame, including a
WKB-hex geometry decode (viz.py:118-134). Spark-side, the same payload is a
single ``from_json`` projection against a typed schema: JVM-vectorized,
no Python, and usable identically in batch or Structured Streaming
(`readStream` + socket/file source feeding the same decoder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["SENSOR_BATCH_SCHEMA", "sensor_batch_from_json"]

_ROW = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

# One payload = three parallel arrays of rows (stream_sim.py:294-301).
SENSOR_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("heart_rates", T.ArrayType(_ROW)),
        T.StructField("calories", T.ArrayType(_ROW)),
        T.StructField("coordinates", T.ArrayType(_ROW)),
    ]
)


def sensor_batch_from_json(
    spark: SparkSession, payloads: DataFrame, json_col: str = "payload"
) -> dict[str, DataFrame]:
    """Decode a DataFrame of JSON payload strings into the three fact-shaped
    DataFrames. Coordinates keep their WKB-hex string ``value`` for the geo
    codec (operators.geo.wkb_hex_decode); numeric facts cast to double.

    Works on a batch DF or a streaming DF alike — ``from_json`` + explode
    are fully streaming-safe projections.
    """
    parsed = payloads.select(
        F.from_json(F.col(json_col), SENSOR_BATCH_SCHEMA).alias("b")
    )

    def facts(field: str, numeric: bool) -> DataFrame:
        rows = parsed.select(F.explode(F.col(f"b.{field}")).alias("r")).select(
            F.col("r.user_id").alias("user_id"),
            F.to_timestamp("r.timestamp").alias("timestamp"),
            F.col("r.value").alias("value"),
        )
        if numeric:
            rows = rows.withColumn("value", F.col("value").cast("double"))
        return rows

    return {
        "heart_rates": facts("heart_rates", True),
        "calories": facts("calories", True),
        "coordinates": facts("coordinates", False),
    }
