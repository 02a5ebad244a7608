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

# Event-time columns that ts_range bounds apply to. Current testdata
# stores these as parquet TIMESTAMP(MICROS, ntz) and the predicate
# pushes to the scan natively; a legacy layout that wrote
# TIMESTAMP(NANOS) (read as raw int64 under the nanosAsLong conf, since
# Spark has no nanosecond timestamp type) is still handled by the
# bigint branch below.
_EVENT_TS_COLS = {"events": ["ts"]}


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_range: tuple[int, int] | None = None,
) -> DataFrame:
    """ts_range: optional (lo_epoch_s, hi_epoch_s) INCLUSIVE
    epoch-second bounds for the event-time column, applied so the
    predicate reaches the parquet scan (min/max row-group skipping — at
    100 TB the difference between scanning a day and scanning the
    table). "Inclusive" means second granularity, matching the
    reference's `timestamp_epoch BETWEEN lo AND hi`: every row whose
    truncated epoch-second falls in [lo, hi] is kept, i.e.
    lo <= ts < hi+1."""
    ts_cols = _EVENT_TS_COLS.get(name, [])
    if ts_cols:
        # harmless on the current micros layout; required to read a
        # legacy TIMESTAMP(NANOS) file at all
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in ts_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # Legacy raw-nanos layout: bound the RAW int64 column (the
            # converted column is an expression and cannot push), then
            # convert. Integer `div`, not double `/`: at ~1.7e18 ns the
            # int64->double round-trip has 256 ns ulp (and double->long
            # cast truncates toward zero, wrong pre-1970).
            if ts_range is not None:
                lo_s, hi_s = ts_range
                df = df.filter(
                    (F.col(c) >= int(lo_s) * 1_000_000_000)
                    & (F.col(c) <= int(hi_s) * 1_000_000_000 + 999_999_999)
                )
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif ts_range is not None:
            # Native timestamp layout: a plain column-vs-literal
            # comparison — Catalyst constant-folds the literals and
            # pushes both bounds into the scan. The cast through the
            # UTC session zone makes the literal match the column's
            # (n)tz flavor exactly.
            lo_s, hi_s = ts_range
            col_type = dict(df.dtypes)[c]
            lo = F.timestamp_seconds(F.lit(int(lo_s))).cast(col_type)
            hi = F.timestamp_seconds(F.lit(int(hi_s) + 1)).cast(col_type)
            df = df.filter((F.col(c) >= lo) & (F.col(c) < hi))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql entry."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
