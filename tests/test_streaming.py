from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from machine_telemetry_etl_ml_pipeline_spark.sources.catalog import load_table
from machine_telemetry_etl_ml_pipeline_spark.streaming.windows import (
    dedup_within_watermark,
    file_stream,
    run_to_memory,
    session_counts,
    stream_static_join,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events written as a plain-timestamp parquet dir (the testdata
    file has nanos timestamps the stream schema can't bind to)."""
    d = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, SF, "events").write.parquet(d)
    return d


def test_tumbling_matches_batch(spark, events_dir):
    stream = file_stream(spark, events_dir)
    out = run_to_memory(tumbling_counts(stream, "1 hour"), "t_tumbling")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.window_start, r.n) for r in out.collect()}
    want = {(r[0].start, r.n) for r in batch.collect()}
    assert got == want  # streaming result == batch result over same input


def test_session_counts_runs(spark, events_dir):
    stream = file_stream(spark, events_dir)
    out = run_to_memory(session_counts(stream, gap="30 minutes"), "t_sessions")
    assert out.count() > 0
    assert out.filter("n_events < 1").count() == 0


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    # duplicate the input dir -> every event_id appears twice
    dup = str(tmp_path / "dup")
    shutil.copytree(events_dir, dup, dirs_exist_ok=True)
    spark.read.parquet(events_dir).write.mode("append").parquet(dup)
    stream = file_stream(spark, dup)
    out = run_to_memory(dedup_within_watermark(stream, ["event_id"]), "t_dedup")
    n_unique = spark.read.parquet(events_dir).select("event_id").distinct().count()
    assert out.count() == n_unique


def test_stream_static_join(spark, events_dir):
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(["click", "view", "purchase", "signup", "error"])],
        "event_type string, type_code int",
    )
    stream = file_stream(spark, events_dir)
    out = run_to_memory(stream_static_join(stream, dim, "event_type"), "t_ssjoin")
    assert out.filter("type_code IS NULL").count() == 0
    assert out.count() == spark.read.parquet(events_dir).count()


def test_stateful_running_stats_across_batches(spark, events_dir, tmp_path):
    """applyInPandasWithState must ACCUMULATE across micro-batches:
    feed the same events twice as two files -> final per-user counts
    are exactly double the single-pass counts."""
    import uuid

    from pyspark.sql import functions as F

    from machine_telemetry_etl_ml_pipeline_spark.streaming.stateful import running_user_stats

    two = str(tmp_path / "two_batches")
    df = spark.read.parquet(events_dir)
    df.coalesce(1).write.parquet(two)
    df.coalesce(1).write.mode("append").parquet(two)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(two)
        .select("user_id", "value")
    )
    name = f"t_stateful_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits once per (user, batch); the final emission has
    # the accumulated totals
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n").alias("n_final"))
    )
    single = df.groupBy("user_id").count()
    joined = final.join(single, "user_id")
    assert joined.filter("n_final != 2 * count").count() == 0
    assert joined.count() == single.count()
