"""Multi-dimensional data layout: Z-order (Morton) clustering.

Sorting a table by one column gives perfect min/max pruning on that
column and none on any other. Interleaving the bits of two (scaled)
sort keys — the Morton code — gives BOTH columns locality: every
output file covers a narrow range of each dimension, so parquet
min/max statistics prune scans filtered on either column (or both).
This is the lakehouse Z-ORDER technique expressed with plain column
arithmetic + repartitionByRange; no engine extension required.

All public ops are pure column expressions (whole-stage codegen);
the only extra pass is the min/max aggregate used for scaling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to an integer in [0, 2^bits)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    maxv = (1 << bits) - 1
    return F.least(
        F.greatest((frac * maxv).cast("long"), F.lit(0)), F.lit(maxv)
    )


def morton_code(a: Column, b: Column, bits: int = 12) -> Column:
    """Interleave the low `bits` bits of two non-negative longs:
    result bit 2i = bit i of a, bit 2i+1 = bit i of b."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        code = code.bitwiseOR(abit).bitwiseOR(bbit)
    return code


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    bits: int = 12,
    num_files: int = 8,
) -> None:
    """Write `df` Z-ordered on (col_a, col_b): one min/max pass for
    scaling, then range-partition + in-partition sort on the Morton
    code so each output file covers a small hypercube of both
    dimensions."""
    mm = df.agg(
        F.min(col_a).cast("double").alias("a_lo"),
        F.max(col_a).cast("double").alias("a_hi"),
        F.min(col_b).cast("double").alias("b_lo"),
        F.max(col_b).cast("double").alias("b_hi"),
    ).first()
    z = morton_code(
        _scale_to_bits(F.col(col_a), F.lit(mm.a_lo), F.lit(mm.a_hi), bits),
        _scale_to_bits(F.col(col_b), F.lit(mm.b_lo), F.lit(mm.b_hi), bits),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
