from __future__ import annotations

from pyspark.sql import functions as F

from machine_telemetry_etl_ml_pipeline_spark.operators.core import (
    distinct_values,
    grouped_stats,
    latest_n,
    latest_per_key,
    latest_per_key_maxby,
    range_scan,
    stats,
    top_k_by,
)


def _df(spark, rows, schema="k string, t long, v double"):
    return spark.createDataFrame(rows, schema)


def test_latest_per_key_basic(spark):
    df = _df(spark, [("a", 1, 1.0), ("a", 3, 2.0), ("b", 2, 5.0)])
    out = {r.k: (r.t, r.v) for r in latest_per_key(df, "k", "t").collect()}
    assert out == {"a": (3, 2.0), "b": (2, 5.0)}


def test_latest_per_key_tie_break(spark):
    # equal order values -> tiebreak column decides deterministically
    df = _df(spark, [("a", 1, 1.0), ("a", 1, 9.0), ("a", 1, 5.0)])
    out = latest_per_key(df, "k", "t", tiebreak="v").collect()
    assert len(out) == 1 and out[0].v == 9.0


def test_latest_per_key_null_key(spark):
    df = _df(spark, [(None, 1, 1.0), (None, 2, 2.0), ("a", 1, 3.0)])
    out = latest_per_key(df, "k", "t")
    assert out.count() == 2  # NULL keys form their own group


def test_latest_per_key_maxby_matches_window(spark):
    df = _df(spark, [("a", 1, 1.0), ("a", 3, 2.0), ("b", 2, 5.0), ("b", 9, 7.0)])
    w = {(r.k, r.t, r.v) for r in latest_per_key(df, "k", "t").collect()}
    m = {(r.k, r.t, r.v) for r in latest_per_key_maxby(df, "k", "t", "v").collect()}
    assert w == m


def test_latest_n_and_range_scan(spark):
    df = _df(spark, [("a", t, float(t)) for t in range(10)])
    top = latest_n(df, F.col("k") == "a", "t", 3).collect()
    assert sorted(r.t for r in top) == [7, 8, 9]
    rng = range_scan(df, F.col("k") == "a", "t", 2, 5).collect()
    assert [r.t for r in rng] == [2, 3, 4, 5]


def test_top_k_nulls_last(spark):
    df = _df(spark, [("a", 1, None), ("b", 2, 2.0), ("c", 3, 1.0)])
    out = top_k_by(df, "v", 2, ascending=True, tiebreak="k").collect()
    assert [r.k for r in out] == ["c", "b"]  # NULL sorts last, not first


def test_top_k_empty_input(spark):
    df = _df(spark, [("a", 1, 1.0)]).filter(F.lit(False))
    assert top_k_by(df, "v", 5).count() == 0


def test_distinct_values_sorted(spark):
    df = _df(spark, [("b", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)])
    assert [r.k for r in distinct_values(df, "k").collect()] == ["a", "b"]


def test_stats_and_grouped_stats(spark):
    df = _df(spark, [("a", 1, 1.0), ("a", 2, 3.0), ("b", 3, 5.0)])
    s = stats(df, ["v"]).head()
    assert (s.n, s.min_v, s.max_v, s.avg_v) == (3, 1.0, 5.0, 3.0)
    g = {r.k: r.avg_v for r in grouped_stats(df, "k", avg_cols=["v"]).collect()}
    assert g == {"a": 2.0, "b": 5.0}


def test_stats_all_null_metric(spark):
    df = spark.createDataFrame([("a", None), ("b", None)], "k string, v double")
    s = stats(df, ["v"]).head()
    assert s.n == 2 and s.avg_v is None


def test_stratified_sample_rates(spark):
    """sampleBy: per-stratum rates land near the requested fractions
    (Bernoulli, seed-fixed — loose tolerance)."""
    from machine_telemetry_etl_ml_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "events")
    fractions = {"click": 0.1, "purchase": 1.0}
    s = e.sampleBy("event_type", fractions, seed=42)
    totals = {r.event_type: r.n for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    got = {r.event_type: r.n for r in s.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got.get("purchase") == totals["purchase"]  # fraction 1.0 keeps all
    click_rate = got.get("click", 0) / totals["click"]
    assert 0.05 < click_rate < 0.2, click_rate
    assert "view" not in got  # unlisted strata drop entirely


def test_bernoulli_sample_rate(spark):
    """sample(fraction=0.1, seed=42): the realized rate must be near
    10% (the property ext_sample's docstring promises is asserted)."""
    from machine_telemetry_etl_ml_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "events")
    n = e.count()
    k = e.sample(fraction=0.1, seed=42).count()
    assert 0.07 < k / n < 0.13, (k, n)
