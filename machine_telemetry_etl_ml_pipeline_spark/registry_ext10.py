"""Tenth extension batch (round 5, batch 4): window-composition and
SQL-ML surfaces — running sums with event-triggered resets, the
decision-tree split search in pure relational algebra, and lateral
column aliases (the SELECT-list self-reference surface).

No reference analog (/root/reference/project/db.py:77-475 has no
window functions at all); §2B extensions per the build mandate.
All exact-oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register
from .registry_ext2 import _views


@register(
    "ext_conditional_reset_cumsum",
    """
    WITH seg AS (
      SELECT event_id, user_id, value, ts,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg_id
      FROM events WHERE user_id < 50
    )
    SELECT event_id, user_id, CAST(seg_id AS BIGINT) AS seg_id,
           round(sum(value) OVER (PARTITION BY user_id, seg_id
                                  ORDER BY ts, event_id), 4)
             AS run_since_reset
    FROM seg
    """,
)
def ext_conditional_reset_cumsum(spark, sf_dir):
    """Running total with event-triggered resets (cumulative value
    since each user's last 'signup') — the two-stage window
    composition that expresses resettable accumulators without state:
    stage 1 derives a segment id as a running count of reset events,
    stage 2 runs the cumulative sum partitioned by (user, segment).
    Both windows sort by the same (ts, event_id) order; the second
    shuffle is keyed by a refinement of the first (user_id -> user_id,
    seg_id), so per-user data never crosses executors between stages.
    The streaming analog is stream_stateful_user_stats; this is the
    batch/backfill form."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "event_id",
        "user_id",
        "value",
        "ts",
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .over(w1)
        .alias("seg_id"),
    )
    w2 = Window.partitionBy("user_id", "seg_id").orderBy("ts", "event_id")
    return seg.select(
        "event_id",
        "user_id",
        F.col("seg_id").cast("long").alias("seg_id"),
        F.round(F.sum("value").over(w2), 4).alias("run_since_reset"),
    )


@register(
    "ml_decision_stump",
    """
    WITH labeled AS (
      SELECT l_quantity AS q, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    per_value AS (
      SELECT q, CAST(count(*) AS DOUBLE) AS n, CAST(sum(y) AS DOUBLE) AS pos
      FROM labeled GROUP BY q
    ),
    tot AS (SELECT sum(n) AS nt, sum(pos) AS post FROM per_value),
    cum AS (
      SELECT q,
             sum(n) OVER (ORDER BY q) AS nl,
             sum(pos) OVER (ORDER BY q) AS posl
      FROM per_value
    ),
    scored AS (
      SELECT q AS threshold,
             round(
               (nl / nt) * (1 - pow(posl / nl, 2) - pow((nl - posl) / nl, 2))
               + ((nt - nl) / nt) * (CASE WHEN nt - nl = 0 THEN 0
                   ELSE 1 - pow((post - posl) / (nt - nl), 2)
                        - pow(((nt - nl) - (post - posl)) / (nt - nl), 2) END),
               9) AS gini
      FROM cum CROSS JOIN tot
    ),
    best AS (
      SELECT threshold, gini,
             row_number() OVER (ORDER BY gini, threshold) AS rn
      FROM scored
    )
    SELECT round(threshold, 4) AS threshold, round(gini, 6) AS gini_weighted,
           (SELECT CAST(count(*) AS BIGINT) FROM per_value) AS n_candidates
    FROM best WHERE rn = 1
    """,
)
def ml_decision_stump(spark, sf_dir):
    """Decision-tree split search (best `q <= t` threshold on
    l_quantity for the returnflag label, by weighted Gini impurity) —
    the tree-induction inner loop as relational algebra, the shape
    distributed GBDT learners (XGBoost/LightGBM parity surface, M2/M3)
    evaluate per node: one partial-aggregable groupBy collapses the
    fact table to per-VALUE (count, positives) — after which every
    window/cumsum runs on the CANDIDATE table, bounded by distinct
    feature values (50 here; at 100 TB you'd pre-bin to 256 quantile
    buckets, same plan) — then prefix sums give every threshold's
    left/right class counts in one pass. Gini rounded 1e-9 before the
    argmin ranking (threshold tiebreak), per the float-trajectory
    discipline."""
    li = _t(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    per_value = labeled.groupBy("q").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y").cast("double").alias("pos"),
    )
    tot = per_value.agg(
        F.sum("n").alias("nt"), F.sum("pos").alias("post"), F.count("*").alias("n_candidates")
    )
    wcum = Window.orderBy("q")
    cum = per_value.select(
        "q",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("pos").over(wcum).alias("posl"),
    )
    s = cum.crossJoin(F.broadcast(tot))
    nl, posl = F.col("nl"), F.col("posl")
    nt, post = F.col("nt"), F.col("post")
    nr, posr = nt - nl, post - posl
    gini_l = 1 - F.pow(posl / nl, 2) - F.pow((nl - posl) / nl, 2)
    gini_r = F.when(nr == 0, 0.0).otherwise(
        1 - F.pow(posr / nr, 2) - F.pow((nr - posr) / nr, 2)
    )
    scored = s.select(
        F.col("q").alias("threshold"),
        F.round((nl / nt) * gini_l + (nr / nt) * gini_r, 9).alias("gini"),
        "n_candidates",
    )
    wbest = Window.orderBy("gini", "threshold")
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            F.round("threshold", 4).alias("threshold"),
            F.round("gini", 6).alias("gini_weighted"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )


@register(
    "ext_lateral_column_alias",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS net_cents,
           CAST(round(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                      * l_tax) AS BIGINT) AS tax_cents,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             + CAST(round(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                          * l_tax) AS BIGINT) AS gross_cents
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def ext_lateral_column_alias(spark, sf_dir):
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing
    an alias defined earlier in the SAME select list (net_cents ->
    tax_cents -> gross_cents), saving the nested-subquery chain the
    oracle spells out by full expansion — which also proves the
    analyzer substitutes the alias EXPRESSION, not a snapshot. The
    physical plan is one Project over the pruned scan either way.
    Money math is integer cents throughout: rounding a double that
    both engines computed bit-identically is engine-invariant, while
    re-rounding already-rounded 4dp decimals lands exactly ON .5
    boundaries and diverged at the 10x replica. Registered through
    spark.sql because the alias-resolution path IS the surface under
    test."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 AS net_cents,
               CAST(round(net_cents * l_tax) AS BIGINT) AS tax_cents,
               net_cents + tax_cents AS gross_cents
        FROM lineitem WHERE l_orderkey < 100
        """
    )
