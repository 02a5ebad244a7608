"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over machine_telemetry_etl_ml_pipeline_spark.registry —
every implemented operator from SURVEY.md §2 is registered there as a
(spark_builder, duckdb_oracle_sql) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from machine_telemetry_etl_ml_pipeline_spark import registry  # noqa: E402
from machine_telemetry_etl_ml_pipeline_spark import registry_ext  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext2  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext3  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext4  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_llm  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_udf  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: latest-per-key dedup
    over events (the reference's signature DISTINCT ON idiom,
    /root/reference/project/db.py:237-246) — scan -> shuffle -> window
    -> filter, the engine's spine."""
    tune_session(spark)
    return registry.REGISTRY["ref_latest_per_key"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries get the
    driver's weaker rows-only check."""
    return {name: q.oracle for name, q in registry.REGISTRY.items() if q.oracle is not None}
