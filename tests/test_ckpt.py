"""Checkpoint-rotation hygiene (operators/ckpt.py).

Pins the three facts the iterative operators rely on:
- rotating retires the superseded checkpoint's blocks (the leak
  measured in the module docstring cannot regress silently),
- the frame checkpointed LAST stays fully usable after its
  predecessor is retired (rotation is safe for strictly-superseded
  chains),
- a retired frame is genuinely dead (truncated lineage cannot be
  recomputed) — the reason rotation must only ever retire frames
  nothing downstream references.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import (
    checkpoint_rotate,
    retire_ids,
    unpersist_all,
)


def _persistent(spark):
    return sorted(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_rotate_retires_superseded_blocks(spark):
    unpersist_all(spark)
    df = spark.range(10_000).select("id", (F.col("id") % 5).alias("k"))
    c1, ids1 = checkpoint_rotate(df)
    assert ids1 and set(ids1) <= set(_persistent(spark))
    c2, ids2 = checkpoint_rotate(c1.groupBy("k").count(), retire=ids1)
    live = set(_persistent(spark))
    assert set(ids2) <= live
    assert not (set(ids1) & live), "superseded checkpoint must be unpersisted"
    # the surviving checkpoint is fully usable
    assert c2.count() == 5
    assert c2.agg(F.sum("count")).collect()[0][0] == 10_000
    unpersist_all(spark)


def test_retired_frame_is_dead(spark):
    unpersist_all(spark)
    c1, ids1 = checkpoint_rotate(spark.range(1000).select("id"))
    assert c1.count() == 1000
    retire_ids(spark, ids1)
    # truncated lineage + freed blocks -> any recompute must fail,
    # which is why rotation only retires strictly-superseded frames
    with pytest.raises(Exception):
        c1.count()
    unpersist_all(spark)


def test_unpersist_all_sweeps_everything(spark):
    unpersist_all(spark)
    checkpoint_rotate(spark.range(100).select("id"))
    checkpoint_rotate(spark.range(200).select("id"))
    assert len(_persistent(spark)) >= 2
    n = unpersist_all(spark)
    assert n >= 2
    assert _persistent(spark) == []


def test_unpersist_all_clears_cache_manager_entries(spark):
    """The r8 A/B contamination fix: retiring persistent-RDD blocks
    alone leaves SQL CacheManager ENTRIES alive, and Spark applies
    cached plans to ANY later query with a matching logical subtree —
    so a timing harness that persists in run N silently feeds run N+1.
    unpersist_all must clear both layers."""
    unpersist_all(spark)
    df = spark.range(50_000).select((F.col("id") % 7).alias("k")).groupBy("k").count()
    df.persist()
    assert df.count() == 7  # materialize the cache
    # a SEPARATE frame with the same logical plan picks up the cache
    twin = spark.range(50_000).select((F.col("id") % 7).alias("k")).groupBy("k").count()
    assert "InMemoryTableScan" in twin._jdf.queryExecution().executedPlan().toString()
    unpersist_all(spark)
    twin2 = spark.range(50_000).select((F.col("id") % 7).alias("k")).groupBy("k").count()
    plan = twin2._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan, (
        "CacheManager entry survived unpersist_all — the A/B "
        "cross-contamination path is open again"
    )
    assert _persistent(spark) == []


def test_plancap_records_finalized_construction_plans(spark):
    from machine_telemetry_etl_ml_pipeline_spark.operators import plancap

    unpersist_all(spark)
    df = spark.range(10_000).select("id", (F.col("id") % 5).alias("k"))
    with plancap.capture() as plans:
        c1, ids1 = checkpoint_rotate(df.groupBy("k").count())
        st_df = c1.agg(F.sum("count").alias("s"))
        st_df.collect()
        plancap.note(st_df)
    assert len(plans) == 2
    # finalized executed plans, not provisional adaptive placeholders
    assert all("isFinalPlan=true" in p or "*(" in p for p in plans)
    retire_ids(spark, ids1)
    unpersist_all(spark)


def test_plancap_noop_outside_capture(spark):
    from machine_telemetry_etl_ml_pipeline_spark.operators import plancap

    df = spark.range(10).agg(F.count("*").alias("n"))
    df.collect()
    plancap.note(df)  # must not raise and must record nowhere
    with plancap.capture() as outer:
        with plancap.capture() as inner:
            plancap.note(df)
        plancap.note(df)
        assert len(inner) == 1  # nesting restores the previous sink
        assert len(outer) == 1


def test_reliable_checkpoint_escape_hatch(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT_DIR flips checkpoint_rotate to reliable
    Dataset.checkpoint() against the configured dir (VERDICT r13 item
    7): same data back, no block-manager ids to rotate, and the
    checkpoint actually lands in the directory."""
    unpersist_all(spark)
    ckpt_dir = str(tmp_path / "reliable_ckpt")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt_dir)
    df = spark.range(1_000).select("id", (F.col("id") % 3).alias("k"))
    out, ids = checkpoint_rotate(df)
    assert ids == []  # reliable checkpoints hold no local blocks
    assert out.count() == 1_000
    assert out.groupBy("k").count().count() == 3
    import os as _os

    assert any(
        files for _, _, files in _os.walk(ckpt_dir)
    ), "reliable checkpoint wrote nothing under the configured dir"
    # chained rotation with an empty retire list stays a no-op
    out2, ids2 = checkpoint_rotate(out.groupBy("k").count(), retire=ids)
    assert ids2 == [] and out2.count() == 3
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR")
    unpersist_all(spark)
