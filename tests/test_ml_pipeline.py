from __future__ import annotations

import math

from pyspark.sql import functions as F

from machine_telemetry_etl_ml_pipeline_spark.ml.pipeline import (
    anomaly_pipeline,
    anomaly_scores,
    binary_subset,
    classifier_pipeline,
    regression_pipeline,
    smoke_test_scaler,
)
from machine_telemetry_etl_ml_pipeline_spark.schemas import FEATURE_ORDER


def _featurized(telemetry):
    out = telemetry
    for c in FEATURE_ORDER:
        out = out.withColumn(c, F.col(c).cast("double"))
    return out.na.drop(subset=FEATURE_ORDER)


def test_scaler_moments(spark, telemetry):
    """M1 property check (SURVEY §5): scaled features have mean~0 /
    std~1 on the training data."""
    from pyspark.ml.functions import vector_to_array

    df = _featurized(telemetry)
    model = regression_pipeline().fit(df)
    scaled = model.transform(df).select(vector_to_array("features").alias("f"))
    arr = scaled.select(*[F.col("f")[i].alias(f"f{i}") for i in range(len(FEATURE_ORDER))])
    stats = arr.agg(
        *[F.avg(f"f{i}").alias(f"m{i}") for i in range(len(FEATURE_ORDER))],
        *[F.stddev(f"f{i}").alias(f"s{i}") for i in range(len(FEATURE_ORDER))],
    ).head()
    for i in range(len(FEATURE_ORDER)):
        assert abs(stats[f"m{i}"]) < 1e-6
        s = stats[f"s{i}"]
        assert s is None or math.isnan(s) or abs(s - 1.0) < 1e-6 or s < 1e-9  # constant cols -> 0


def test_regression_predicts_finite(spark, telemetry):
    df = _featurized(telemetry)
    model = regression_pipeline().fit(df)
    preds = model.transform(df).select("prediction")
    assert preds.filter(F.isnan("prediction") | F.col("prediction").isNull()).count() == 0


def test_classifier_on_status_pair(spark, telemetry):
    df = binary_subset(_featurized(telemetry), "Fault", "Idle")
    assert set(r.label for r in df.select("label").distinct().collect()) == {0.0, 1.0}
    model = classifier_pipeline().fit(df)
    preds = model.transform(df)
    assert preds.filter(~F.col("prediction").isin(0.0, 1.0)).count() == 0


def test_anomaly_scores_and_threshold(spark, telemetry):
    df = _featurized(telemetry)
    model = anomaly_pipeline(k=3).fit(df)
    scored = anomaly_scores(model, df)
    n = scored.count()
    flagged = scored.filter("is_anomaly = 1").count()
    assert 0 < flagged <= max(1, int(n * 0.10))  # ~5% quantile threshold
    assert scored.filter(F.col("anomaly_score") < 0).count() == 0


def test_smoke_scaler_row(spark, telemetry):
    """M6: the reference's hardcoded smoke row transforms to finite
    values (dags/db_pipeline_dag.py:35-42)."""
    model = regression_pipeline().fit(_featurized(telemetry))
    vec = smoke_test_scaler(model, spark)
    assert len(vec) == len(FEATURE_ORDER)
    assert all(not math.isnan(x) and not math.isinf(x) for x in vec)


def test_pipeline_save_load_roundtrip(spark, telemetry, tmp_path):
    from pyspark.ml import PipelineModel

    df = _featurized(telemetry)
    model = regression_pipeline().fit(df)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    back = PipelineModel.load(path)
    a = model.transform(df).agg(F.sum("prediction")).head()[0]
    b = back.transform(df).agg(F.sum("prediction")).head()[0]
    assert math.isclose(a, b, rel_tol=1e-12)
