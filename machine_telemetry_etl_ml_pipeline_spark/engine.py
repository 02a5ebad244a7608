"""TelemetryEngine — the drop-in facade for the reference's
``Database`` + ``DataIngestor`` classes (/root/reference/project/db.py,
project/database_and_model_tools.py): every public method a reference
user calls today exists here with the same name and argument shape,
returning lazy DataFrames instead of fetched dict-rows.

Differences by design (SURVEY §3):
- reads return un-executed DataFrames (call .collect()/.toPandas() at
  the edge) — the reference's client-side sort/slice/refilter stages
  are already folded into the plans;
- writes go through partitioned-parquet sinks with write-time default
  columns (no SERIAL ids — see ref_surrogate_ids for the parity note);
- ``execute_query`` is spark.sql over the registered views: the
  read-vs-write dispatch heuristic (db.py:55-75) disappears because
  the DataFrame/writer split makes it structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ingest as _ingest
from .plans import telemetry as plans
from .schemas import PREDICTIONS, USER_QUERY_LOG
from .session import get_spark, tune_session


class TelemetryEngine:
    """One engine instance per storage root (the reference's singleton
    connection, db.py:15-19, becomes one SparkSession + table root)."""

    def __init__(self, root: str, spark: SparkSession | None = None):
        self.spark = tune_session(spark or get_spark("telemetry-engine"))
        self.root = root.rstrip("/")
        self._paths = {
            "telemetry": f"{self.root}/telemetry",
            "user_query_log": f"{self.root}/user_query_log",
            "predictions": f"{self.root}/predictions",
        }

    # --- DDL / setup (reference init_db, db.py:77-151) -------------------

    def init_db(self) -> None:
        """Idempotent: registers the three table views if data exists;
        index DDL has no analog (layout handles it — SCALE.md)."""
        for name in self._paths:
            df = self._read_or_empty(name)
            df.createOrReplaceTempView(name)

    def _read_or_empty(self, name: str) -> DataFrame:
        import os

        path = self._paths[name]
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        schema = {
            "telemetry": _ingest.TELEMETRY,
            "user_query_log": USER_QUERY_LOG,
            "predictions": PREDICTIONS,
        }[name]
        return self.spark.createDataFrame([], schema)

    def telemetry(self) -> DataFrame:
        return self._read_or_empty("telemetry")

    # --- ingest (reference DataIngestor, database_and_model_tools.py) ----

    def ingest_csv(self, csv_path: str) -> int:
        return _ingest.ingest_csv(self.spark, csv_path, self._paths["telemetry"])

    def insert_telemetry(self, data: dict) -> int:
        """reference db.py:153-161"""
        return _ingest.insert_rows(self.spark, [data], self._paths["telemetry"])

    def log_user_query(
        self,
        role: str,
        query: str,
        intent: str,
        confidence: float | None = None,
        machine_id: str | None = None,
        target_time_epoch: int | None = None,
    ) -> None:
        """reference db.py:163-169: ts_epoch default + None->0.0."""
        row = [(role, query, intent, float(confidence or 0.0), machine_id, target_time_epoch, None)]
        df = self.spark.createDataFrame(row, USER_QUERY_LOG).withColumn(
            "ts_epoch", F.unix_timestamp(F.current_timestamp()).cast("long")
        )
        df.write.mode("append").parquet(self._paths["user_query_log"])

    def log_prediction(
        self, machine_id: str, intent: str, numerical_answer: float | None, features: dict
    ) -> None:
        """reference db.py:171-185: numpy scalars are handled by Arrow;
        the JSONB column is a native map."""
        row = [(machine_id, intent, float(numerical_answer or 0.0), {k: float(v) for k, v in features.items()}, None)]
        df = self.spark.createDataFrame(row, PREDICTIONS).withColumn(
            "ts_epoch", F.unix_timestamp(F.current_timestamp()).cast("long")
        )
        df.write.mode("append").parquet(self._paths["predictions"])

    # --- reads (reference get_* methods, db.py:187-475) ------------------

    def get_latest_telemetry(self, machine_id: str, limit: int = 1) -> DataFrame:
        return plans.get_latest_telemetry(self.telemetry(), machine_id, limit)

    def get_telemetry_range(self, machine_id: str, start_epoch: int, end_epoch: int) -> DataFrame:
        return plans.get_telemetry_range(self.telemetry(), machine_id, start_epoch, end_epoch)

    def get_machine_list(self) -> DataFrame:
        return plans.get_machine_list(self.telemetry())

    def get_telemetry_stats(self, machine_id: str | None = None) -> DataFrame:
        return plans.get_telemetry_stats(self.telemetry(), machine_id)

    def get_highest_temperature_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_highest_temperature_machines(self.telemetry(), limit)

    def get_highest_humidity_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_highest_humidity_machines(self.telemetry(), limit)

    def get_highest_vibration_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_highest_vibration_machines(self.telemetry(), limit)

    def get_highest_fuel_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_highest_fuel_machines(self.telemetry(), limit)

    def get_lowest_temperature_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_lowest_temperature_machines(self.telemetry(), limit)

    def get_lowest_humidity_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_lowest_humidity_machines(self.telemetry(), limit)

    def get_lowest_vibration_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_lowest_vibration_machines(self.telemetry(), limit)

    def get_lowest_fuel_machines(self, limit: int = 5) -> DataFrame:
        return plans.get_lowest_fuel_machines(self.telemetry(), limit)

    def get_machines_by_status(self, status_filter: str) -> DataFrame:
        return plans.get_machines_by_status(self.telemetry(), status_filter)

    def get_machine_comparison_stats(self) -> DataFrame:
        return plans.get_machine_comparison_stats(self.telemetry())

    # --- SQL entry (reference execute_query, db.py:55-75) ----------------

    def execute_query(self, sql: str) -> DataFrame:
        self.init_db()
        return self.spark.sql(sql)

    # --- verification (reference verify_database_setup) ------------------

    def verify_database_setup(self) -> dict[str, int]:
        """database_and_model_tools.py:117-125: COUNT(*) per table."""
        return {name: self._read_or_empty(name).count() for name in self._paths}
