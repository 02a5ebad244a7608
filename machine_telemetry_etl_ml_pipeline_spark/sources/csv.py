"""CSV source for the telemetry ingest path.

Reference: pandas read_csv materializes the whole file on the driver
(/root/reference/project/database_and_model_tools.py:37-51). Spark-first:
a schema'd distributed csv scan — header normalization happens after the
read so dirty headers can't corrupt types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TELEMETRY_RENAME


def read_telemetry_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a raw (possibly CamelCase-headed) telemetry CSV.

    Types are inferred as string first and cast explicitly in the ingest
    transform (machine_telemetry_etl_ml_pipeline_spark.ingest) — the
    reference's timestamp format ``M/d/yyyy H:mm`` defeats inference.
    """
    df = spark.read.csv(path, header=True)
    # CamelCase -> canonical, with .lower() fallback for unknown headers
    # (reference database_and_model_tools.py:53-57)
    mapping = {c: TELEMETRY_RENAME.get(c, c.lower()) for c in df.columns}
    return df.select([F.col(f"`{c}`").alias(a) for c, a in mapping.items()])
