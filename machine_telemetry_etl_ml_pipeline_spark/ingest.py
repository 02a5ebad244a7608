"""Telemetry ingest path — the Spark-first rebuild of the reference's
EP1 lifecycle (SURVEY §3): pandas read_csv -> rename -> fillna ->
execute_values INSERT (/root/reference/project/database_and_model_tools.py:37-97)
becomes a distributed schema'd scan -> declarative transforms -> one
atomic partitioned-parquet commit.

Physical layout replaces the reference's 6 btree indexes
(/root/reference/project/db.py:128-135): partition by event date
(coarse time bucket -> partition pruning for the range scans) and sort
within partitions by (machineid, timestamp_epoch) so the composite-
index access pattern (latest-per-machine, range scans) becomes a
sorted, pruned columnar read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.timefeat import dayofweek_monday0, with_write_defaults
from .schemas import STATUS_ENCODING, TELEMETRY, TELEMETRY_FILL
from .sources.csv import read_telemetry_csv

# Reference CSV timestamp format: `9/1/2025 0:00`
# (/root/reference/project/data/machine_data_cleaned.csv:2)
CSV_TS_FORMAT = "M/d/yyyy H:mm"

_DOUBLE_COLS = [
    "enginetemperature",
    "fuelconsumption",
    "vibrationlevel",
    "humidity",
    "pressure",
    "poweroutput",
    "operatinghours",
]


def normalize_telemetry(raw: DataFrame) -> DataFrame:
    """Cast the string-typed CSV columns to the canonical schema,
    fill nulls with the reference defaults
    (database_and_model_tools.py:59-71), and (re)derive the time
    features (reference precomputes them in the CSV; deriving keeps
    dirty inputs consistent)."""
    df = raw.withColumn("timestamp", F.to_timestamp("timestamp", CSV_TS_FORMAT))
    for c in _DOUBLE_COLS:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("double"))
    df = df.na.fill(TELEMETRY_FILL)
    status_code = F.lit(None).cast("int")
    for status, code in reversed(list(STATUS_ENCODING.items())):
        status_code = F.when(F.col("status") == status, code).otherwise(status_code)
    df = (
        df.withColumn("status_encoded", status_code)
        .withColumn("timestamp_epoch", F.unix_timestamp("timestamp").cast("long"))
        .withColumn("hour", F.hour("timestamp").cast("int"))
        .withColumn("dayofweek", dayofweek_monday0(F.col("timestamp")))
        .withColumn("month", F.month("timestamp").cast("int"))
    )
    df = with_write_defaults(df)
    return df.select([f.name for f in TELEMETRY.fields])


def ingest_csv(spark: SparkSession, csv_path: str, table_path: str) -> int:
    """Full EP1: scan -> normalize -> atomic partitioned append.
    Returns the ingested row count (the reference's ingest_csv
    contract, database_and_model_tools.py:37-51)."""
    raw = read_telemetry_csv(spark, csv_path)
    clean = normalize_telemetry(raw)
    write_telemetry(clean, table_path)
    # Count THIS batch, not the post-append table total — on a second
    # ingest into a non-empty table the table count would overcount the
    # reference contract (rows inserted from this CSV).
    return clean.count()


def write_telemetry(df: DataFrame, table_path: str, mode: str = "append") -> None:
    """Partitioned, in-partition-sorted sink (layout rationale in the
    module docstring). One atomic commit replaces the reference's
    psycopg2 transaction (database_and_model_tools.py:90-96)."""
    (
        df.withColumn("event_date", F.to_date("timestamp"))
        .repartition(F.col("event_date"))
        .sortWithinPartitions("machineid", "timestamp_epoch")
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(table_path)
    )


def insert_rows(spark: SparkSession, rows: list[dict], table_path: str) -> int:
    """Single/small-batch insert (reference insert_telemetry,
    project/db.py:153-161): route through the same normalize + write
    path so write-time defaults stay consistent."""
    raw = spark.createDataFrame(rows)
    for f in TELEMETRY.fields:
        if f.name not in raw.columns:
            raw = raw.withColumn(f.name, F.lit(None).cast(f.dataType))
    clean = normalize_telemetry(
        raw.withColumn("timestamp", F.date_format("timestamp", CSV_TS_FORMAT))
        if dict(raw.dtypes).get("timestamp") == "timestamp"
        else raw
    )
    write_telemetry(clean, table_path)
    return len(rows)
