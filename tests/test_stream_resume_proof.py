"""availableNow multi-batch checkpoint-resume proof at sf0.1
(VERDICT r10 item 6, carried from r9 item 7).

The registered entry `stream_checkpoint_resume` proves RESULT-level
exactly-once (final compacted state == the batch oracle) but cannot
discriminate "resumed from the recorded offsets" vs "ignored the
checkpoint and reprocessed everything" — a restart that re-read all
files would land on the same final aggregate. This test adds the
OFFSET-LOG-level property the entry can't express, at sf0.1 (the
full 100k-row events table, not the entry's user_id<40 slice):

- stage events as exactly 4 parquet files; drain 2 per leg with
  `maxFilesPerTrigger=1` under ONE shared checkpoint (availableNow
  honors read limits, so each file is its own micro-batch);
- leg 1's foreachBatch invocations must carry batch ids [0, 1];
- leg 2's must carry [2, 3] — a strict CONTINUATION, one batch per
  file that landed AFTER the restart. Reprocessing restarts ids at 0
  and/or runs 4 batches; offset loss runs fewer than 2.
- on top, append-mode row accounting: the sink holds each staged row
  exactly once, and per-user counts equal the batch aggregate
  (append mode turns any reprocess into visible duplicates).

At 100 TB this is the property that makes a nightly availableNow
ingest restartable mid-backlog: the offset log, not the sink
contents, is what guarantees the second run bills only new data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"


def test_resume_processes_exactly_the_new_files(spark, tmp_path):
    from machine_telemetry_etl_ml_pipeline_spark.registry import _t

    stage = str(tmp_path / "stage")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    events = _t(spark, SF, "events").select("event_id", "user_id")
    events.repartition(4).write.parquet(stage)
    files = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    assert len(files) == 4
    os.makedirs(src)

    def run_leg() -> list[int]:
        seen: list[int] = []

        def _write(batch, batch_id: int) -> None:
            seen.append(batch_id)
            batch.write.mode("append").parquet(sink)

        q = (
            spark.readStream.schema("event_id bigint, user_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(_write)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(seen)

    for f in files[:2]:
        shutil.copy(f"{stage}/{f}", f"{src}/{f}")
    assert run_leg() == [0, 1]

    for f in files[2:]:
        shutil.copy(f"{stage}/{f}", f"{src}/{f}")
    # the discriminating assertion: ids CONTINUE and there are exactly
    # as many micro-batches as files that landed after the restart
    assert run_leg() == [2, 3]

    # append-mode row accounting: each staged row landed exactly once
    got = spark.read.parquet(sink)
    assert got.count() == events.count()
    want = {
        (r.user_id, r.n)
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    have = {
        (r.user_id, r.n)
        for r in got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert have == want
