"""Sources & sinks (SURVEY §2.1): CSV, JSON micro-batches, GeoJSON, DDL.

Each maps a reference ingestion/export path onto a declarative Spark
reader/writer so Catalyst sees the whole plan (pushdown + pruning reach the
scan). Nothing here materializes driver-side beyond schema metadata.
"""

from .columnar import read_orc, write_orc
from .csv_io import read_csv, write_csv
from .ddl import create_instance, ddl_for_config, list_tables
from .geojson import read_geojson_polygons
from .json_io import SENSOR_BATCH_SCHEMA, sensor_batch_from_json
from .models import load_model, save_model
from .versioned import (
    list_versions,
    read_versioned,
    upsert_parquet,
    vacuum_versions,
)

__all__ = [
    "read_csv",
    "write_csv",
    "read_orc",
    "write_orc",
    "sensor_batch_from_json",
    "SENSOR_BATCH_SCHEMA",
    "read_geojson_polygons",
    "ddl_for_config",
    "create_instance",
    "list_tables",
    "upsert_parquet",
    "read_versioned",
    "list_versions",
    "vacuum_versions",
    "save_model",
    "load_model",
]
