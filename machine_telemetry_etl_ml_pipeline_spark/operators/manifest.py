"""File-level min/max manifest: table-format-style metadata pruning
on plain parquet directories.

Partition directories prune on the partition column only; parquet
row-group stats prune only after a file is opened. A MANIFEST — one
tiny row per data file with per-column min/max — lets the planner drop
whole files before any data I/O, the way Iceberg/Delta metadata does,
with nothing but a parquet side table. Combined with a Z-ordered
layout (operators/layout.py) the manifest prunes on EVERY clustered
dimension.

Scale shape: building the manifest is one aggregation grouped by
input_file_name (a narrow full scan, done once per write); a pruned
read is a manifest scan (KBs) + a read of only the surviving files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(
    spark: SparkSession, table_path: str, cols: list[str], manifest_path: str
) -> None:
    """One row per data file: (file, min_<c>, max_<c> for each c)."""
    df = spark.read.parquet(table_path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(manifest_path)
    )


def pruned_read(
    spark: SparkSession,
    table_path: str,
    manifest_path: str,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read only the files whose [min_col, max_col] overlaps [lo, hi],
    then apply the exact row filter. The manifest scan is tiny; files
    with no overlap are never opened."""
    m = spark.read.parquet(manifest_path)
    files = [
        r.file
        for r in m.filter(
            (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
        ).collect()
    ]
    if not files:
        return (
            spark.read.parquet(table_path)
            .filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(F.col(col).between(lo, hi))
