"""Twenty-ninth extension batch (round 7 — deliberately tiny, the
round is a verification round per the r6 verdict's surface freeze):
the VARIANT shred/unshred round trip through parquet, the one surface
the r6 verdict named as genuinely unrepresented (item 8).

`ext_variant_roundtrip`: build a nested JSON object per event from
typed columns, parse_json -> VARIANT, WRITE it to parquet (Spark 4
stores variant as the binary (metadata, value) pair under the VARIANT
logical type — the "shred" leg), read it back ("unshred"), extract
typed paths with variant_get, and prove the binary encoding is
lossless by comparing to_json(v) against the original JSON text
per row. The object keys are chosen already-alphabetical (arr, et,
id, k) so the variant encoding's sorted-field-id dictionary cannot
reorder them between parse and to_json.

Pushdown note (probed on this build, pinned by
tests/test_ext29.py::test_variant_get_pushes_into_scan): Spark 4.1's
PushVariantIntoScan rule rewrites variant_get over a parquet variant
column into struct-field accesses AT THE SCAN — a filter on
variant_get(v, '$.k', 'long') lands in the FileScan's DataFilters as
a plain struct comparison and no variant_get survives into the scan
node, so at 100 TB the reader materializes only the requested paths
instead of the full binary value. That is the property that makes
VARIANT the scale path for semi-structured columns vs re-parsing
JSON strings per access (ext_json_extract) or per-query from_json
maps (ext_json_schema_infer).

Reference analog: the JSONB props column the reference stores and
introspects (project/db.py insert-with-JSON paths) — VARIANT is its
typed, prunable upgrade.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from .registry import _t, register


@register(
    "ext_variant_roundtrip",
    """
    WITH s AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(3 * k) AS BIGINT) AS sum_arr2,
           count(*) AS n_roundtrip
    FROM s GROUP BY event_type
    """,
)
def ext_variant_roundtrip(spark, sf_dir):
    """VARIANT shred/unshred round trip: JSON text -> parse_json ->
    parquet write -> read -> variant_get typed extraction + to_json
    equality. The oracle computes the same aggregates straight from
    the source columns and pins n_roundtrip = count(*): ANY row whose
    binary variant fails to reproduce its source JSON byte-for-byte
    breaks the hash match. sum_arr2 extracts '$.arr[2]' (= 3k by
    construction) so array-path extraction is value-checked too, not
    just object fields. The scratch table is read back before the
    aggregate so the extraction exercises the parquet variant READER
    (the unshred leg), not the in-memory expression."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    js = F.to_json(
        F.struct(
            F.array(k, 2 * k, 3 * k).alias("arr"),
            F.col("event_type").alias("et"),
            F.col("event_id").alias("id"),
            k.alias("k"),
        )
    )
    staged = e.select(js.alias("js")).withColumn("v", F.expr("parse_json(js)"))
    work = tempfile.mkdtemp(prefix="variant_rt_")
    try:
        staged.write.mode("overwrite").parquet(work)
        back = spark.read.parquet(work)
        shredded = back.select(
            F.expr("variant_get(v, '$.et', 'string')").alias("event_type"),
            F.expr("variant_get(v, '$.k', 'long')").alias("k"),
            F.expr("variant_get(v, '$.arr[2]', 'long')").alias("arr2"),
            (F.expr("to_json(v)") == F.col("js")).alias("rt_ok"),
        )
        out = shredded.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum("arr2").alias("sum_arr2"),
            F.sum(F.when(F.col("rt_ok"), 1).otherwise(0)).cast("long").alias("n_roundtrip"),
        )
        rows = out.collect()  # materialize before the scratch dir is removed
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
