from __future__ import annotations

from pyspark.sql import functions as F

from machine_telemetry_etl_ml_pipeline_spark.operators.joins import (
    anti_join,
    asof_join,
    semi_join,
)
from machine_telemetry_etl_ml_pipeline_spark.operators.windows import (
    lag_lead,
    ranked,
    sessionized,
)


def test_semi_anti(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, x string")
    right = spark.createDataFrame([(1,), (3,)], "id long")
    assert {r.id for r in semi_join(left, right, "id").collect()} == {1, 3}
    assert {r.id for r in anti_join(left, right, "id").collect()} == {2}


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")], "k long, t long, name string"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (1, 25, 300.0), (2, 9, 400.0)],
        "k long, t long, v double",
    )
    out = {r.name: r.asof_v for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()}
    # p1@10 -> right@5; p2@20 -> right@15; p3@5 -> nothing before it
    assert out == {"p1": 100.0, "p2": 200.0, "p3": None}


def test_asof_join_inclusive_tie(spark):
    left = spark.createDataFrame([(1, 10, "p")], "k long, t long, name string")
    right = spark.createDataFrame([(1, 10, 7.0)], "k long, t long, v double")
    out = asof_join(left, right, "k", "t", "t", ["v"]).head()
    assert out.asof_v == 7.0  # right row at equal ts matches (<= semantics)


def test_ranked_rank_vs_rownum(spark):
    df = spark.createDataFrame(
        [("s", 1, 5.0), ("s", 2, 5.0), ("s", 3, 3.0)], "p string, id long, v double"
    )
    rows = {r.id: (r.row_num, r.rnk, r.dense_rnk) for r in
            ranked(df, "p", "v", tiebreak="id").collect()}
    assert rows[1] == (1, 1, 1) and rows[2] == (2, 1, 1)  # tie shares rank
    assert rows[3] == (3, 3, 2)


def test_lag_lead(spark):
    df = spark.createDataFrame([("u", 1, 1.0), ("u", 2, 2.0)], "p string, t long, v double")
    r = {x.t: (x.prev_v, x.next_v) for x in lag_lead(df, "p", "t", "v", tiebreak="t").collect()}
    assert r[1] == (None, 2.0) and r[2] == (1.0, None)


def test_sessionized_gap(spark):
    rows = [("u", t, i) for i, t in enumerate(["2024-01-01 00:00:00",
                                               "2024-01-01 00:10:00",
                                               "2024-01-01 01:00:00"])]
    df = spark.createDataFrame(rows, "k string, ts string, id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = sessionized(df, "k", "ts", gap_seconds=1800, tiebreak="id")
    sessions = {r.id: r.session_id for r in out.collect()}
    assert sessions[0] == sessions[1] != sessions[2]
