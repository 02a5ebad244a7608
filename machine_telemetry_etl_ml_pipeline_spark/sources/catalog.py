"""Table catalog over the driver's parquet testdata.

Parquet (columnar, min/max statistics, partition-prunable) replaces the
reference's Postgres heap tables + 6 btree indexes
(/root/reference/project/db.py:128-135): Catalyst pushes predicates and
projections into the scan, which at 100 TB is the difference between
reading a column chunk and reading the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

# Parquet columns written as TIMESTAMP(NANOS) — Spark has no nanosecond
# timestamp type, so these are read as raw int64 nanos (legacy conf) and
# converted to microsecond timestamps (truncation, matching how DuckDB
# and Arrow downcast nanos->micros).
_NANOS_TS_COLS = {"events": ["ts"]}


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_range: tuple[int, int] | None = None,
) -> DataFrame:
    """ts_range: optional (lo_epoch_s, hi_epoch_s) INCLUSIVE bounds for
    the nanos timestamp column, applied to the RAW int64 column BEFORE
    conversion. The converted column is an expression, so predicates on
    it cannot reach the parquet scan; the raw-column predicate pushes
    (min/max row-group skipping — at 100 TB the difference between
    scanning a day and scanning the table). The bounds are exactly
    equivalent to `lo <= converted_ts <= hi` for non-negative epochs:
    ns div 1000 >= lo*1e6  <=>  ns >= lo*1e9, and
    ns div 1000 <= hi*1e6 + 999999  <=>  ns <= hi*1e9 + 999999999."""
    nanos_cols = _NANOS_TS_COLS.get(name, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            if ts_range is not None:
                lo_s, hi_s = ts_range
                df = df.filter(
                    (F.col(c) >= int(lo_s) * 1_000_000_000)
                    & (F.col(c) <= int(hi_s) * 1_000_000_000 + 999_999_999)
                )
            # Integer `div`, not double `/`: at ~1.7e18 ns the int64->double
            # round-trip has 256 ns ulp, so `/1000` can land a microsecond off
            # (and double->long cast truncates toward zero, wrong pre-1970).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql entry."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
