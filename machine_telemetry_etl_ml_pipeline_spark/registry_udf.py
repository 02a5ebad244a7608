"""UDF surface (SURVEY §2B last row): scalar pandas_udf, grouped-map
applyInPandas, and row-at-a-time Python UDF — each oracle-checked so
the Python<->JVM plumbing is held to the same differential bar as the
built-in operators.

Scale notes: pandas_udf/applyInPandas move Arrow BATCHES across the
Python boundary (vectorized, ~10-100x over per-row); the plain @udf
exists for API completeness and is the documented slow path — nothing
in this repo uses it on a hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .registry import _t, register


@register(
    "udf_pandas_scalar",
    """
    SELECT event_id,
           round(sqrt(abs(value)) + CAST(floor(value / 10) AS DOUBLE), 4) AS scored
    FROM events
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized scalar pandas_udf (Arrow batches): numpy arithmetic
    on whole columns. The oracle is the equivalent SQL expression —
    numpy and the JVM produce identical float64 for sqrt/abs/floor."""

    @F.pandas_udf(DoubleType())
    def score(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.sqrt(np.abs(v)) + np.floor(v / 10.0)

    e = _t(spark, sf_dir, "events")
    return e.select("event_id", F.round(score("value"), 4).alias("scored"))


@register(
    "udf_apply_in_pandas",
    """
    SELECT event_id, user_id,
           CAST(cents * count(*) OVER (PARTITION BY user_id)
                - sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS centered_scaled
    FROM (SELECT event_id, user_id,
                 CAST(round(value * 100) AS BIGINT) AS cents FROM events)
    """,
)
def udf_apply_in_pandas(spark, sf_dir):
    """Grouped-map applyInPandas: per-user mean-centering computed as
    whole-group pandas frames (the custom-stateful-operator escape
    hatch). Oracle-parity note (round-2 fix): the centered value is
    emitted as the EXACT integer (cents*n - sum_cents), i.e. the
    centered amount scaled by the group size — rounding a float
    quotient hits pandas-half-even vs DuckDB-half-away tie boundaries
    (observed: 105.2142 vs 105.2143 at sf0.01). Integer arithmetic is
    engine-independent; the grouped-map plumbing under test is
    unchanged."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        cents = (pdf["value"] * 100).round().astype("int64")
        pdf["centered_scaled"] = cents * len(pdf) - cents.sum()
        return pdf[["event_id", "user_id", "centered_scaled"]]

    return e.groupBy("user_id").applyInPandas(
        center, "event_id long, user_id long, centered_scaled long"
    )


@register(
    "udf_python_row",
    """
    SELECT event_id,
           CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                WHEN event_type = 'error' THEN 'failure'
                ELSE 'engagement' END AS bucket
    FROM events
    """,
)
def udf_python_row(spark, sf_dir):
    """Row-at-a-time Python UDF — API completeness only (the SLOW
    path: one Python call per row; the same logic belongs in
    when/otherwise, which is what the oracle uses)."""

    @F.udf("string")
    def bucket(t: str) -> str:
        if t in ("purchase", "signup"):
            return "conversion"
        if t == "error":
            return "failure"
        return "engagement"

    e = _t(spark, sf_dir, "events")
    return e.select("event_id", bucket("event_type").alias("bucket"))
