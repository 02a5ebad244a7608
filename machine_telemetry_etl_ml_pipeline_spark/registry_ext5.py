"""Round-2 extension batch:

- remaining §2B join variants: right / full-outer / broadcast
  band-range join / SQL-hinted broadcast;
- seven more TPC-H shapes over the slimmed testdata schema (Q5, Q7,
  Q8, Q10, Q13, Q18, plus Q12/Q19 adaptations — the testdata lacks
  l_shipmode/l_commitdate/l_receiptdate and p_container, so those two
  keep the classic plan SHAPE with the columns that exist);
- ML differential checks (seeded GBT fit+score invariants, M2/M3);
- sources/sinks: JSONL + ORC digest round trips, PERMISSIVE
  corrupt-CSV capture, small-file compaction, dynamic partition
  overwrite, Z-order + manifest metadata-pruned scan;
- subquery/set-op completions: NOT IN (null-aware), LATERAL,
  recursive CTE, INTERSECT/EXCEPT ALL;
- multi-granularity time rollup, higher-order array functions,
  ordered array aggregation, percentile_approx accuracy check,
  stratified sampling;
- streaming: stream-stream interval join, foreachBatch sink;
- Spark 4 surfaces: VARIANT JSON extraction, SQL-body scalar UDF,
  approx_top_k heavy-hitters sketch.

Float-parity convention (round-1 memory): aggregates are rounded to
4dp on BOTH sides; ratios of two large sums are emitted as separate
numerator/denominator columns instead of a rounded quotient (quotient
rounding lands on half-boundaries where engines legitimately differ).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from .registry import _t, register
from .registry_ext2 import _views

# --- remaining join variants ------------------------------------------------


@register(
    "ext_join_right",
    """
    SELECT p_partkey, count(l_orderkey) AS n_lineitems
    FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey
    """,
)
def ext_join_right(spark, sf_dir):
    """Right outer join: every part appears, parts never shipped get
    count 0 (count of a NULL join column). Build side is the fact
    table; at scale Spark plans this as the mirrored left join."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey")
    p = _t(spark, sf_dir, "part").select("p_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@register(
    "ext_join_full_outer",
    """
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           COALESCE(a.n_clicks, 0) AS n_clicks,
           COALESCE(b.n_purchases, 0) AS n_purchases,
           (a.user_id IS NOT NULL AND b.user_id IS NOT NULL) AS in_both
    FROM (SELECT user_id, count(*) AS n_clicks FROM events
          WHERE event_type = 'click' GROUP BY user_id) a
    FULL OUTER JOIN
         (SELECT user_id, count(*) AS n_purchases FROM events
          WHERE event_type = 'purchase' GROUP BY user_id) b
      ON a.user_id = b.user_id
    """,
)
def ext_join_full_outer(spark, sf_dir):
    """Full outer join of two aggregates with presence indicators —
    both sides survive, missing counts coalesce to 0."""
    e = _t(spark, sf_dir, "events")
    a = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    b = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = a.alias("a").join(b.alias("b"), F.col("a.user_id") == F.col("b.user_id"), "full")
    return joined.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        (F.col("a.user_id").isNotNull() & F.col("b.user_id").isNotNull()).alias("in_both"),
    )


_BANDS = [(i, float(i * 10000), float((i + 1) * 10000)) for i in range(11)]
_BANDS_SQL = ", ".join(f"({b}, {lo}::DOUBLE, {hi}::DOUBLE)" for b, lo, hi in _BANDS)


@register(
    "ext_range_join",
    f"""
    SELECT band, count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS band_revenue
    FROM lineitem JOIN (VALUES {_BANDS_SQL}) bands(band, lo, hi)
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def ext_range_join(spark, sf_dir):
    """Band/range join: facts joined to a small interval dimension on a
    BETWEEN-style condition. The dim is explicitly broadcast, so the
    non-equi condition never forces a cartesian shuffle — each fact
    partition scans the 11-row interval list in place (the only
    scale-sane plan for interval joins with a small dim side). Band
    revenue folds as an exact per-row-cents BIGINT sum (the tpch_q19
    class, resurfaced by the full-registry 10x sweep: ~3e10 band sums
    put float partial-sum order error above the 4dp grid)."""
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = spark.createDataFrame(_BANDS, "band int, lo double, hi double")
    joined = li.join(
        F.broadcast(bands),
        (F.col("l_extendedprice") >= F.col("lo")) & (F.col("l_extendedprice") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("double")
            / 100
        ).alias("band_revenue"),
    )


# --- TPC-H shapes (continued from registry_ext2) ----------------------------


@register(
    "tpch_q5",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 local-supplier-volume: the 6-way join spine. Dims
    (nation, region) broadcast; the fact-fact joins (orders-lineitem-
    supplier) stay shuffle joins for AQE to re-plan; the local
    co-nation predicate c_nationkey = s_nationkey rides the join."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume-shipping: dual-nation join (nation broadcast
    twice under different roles) with a disjunctive cross-nation
    predicate and per-year rollup."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_9' THEN volume_u ELSE 0 END) AS DOUBLE)
             / 10000.0 AS nation_volume,
           CAST(sum(volume_u) AS DOUBLE) / 10000.0 AS total_volume
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS volume_u,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 market-share shape (8-way join). Parity note: the
    share is emitted as separate numerator/denominator sums — a rounded
    quotient of two large float sums is exactly the half-boundary trap
    (round-1 memory). Since r11 each sum rides integer 1e-4-dollar
    units (cents x (100 - pct), exact BIGINT per row, DECIMAL(38,0)
    accumulation, one display division): the r11 100x probe caught
    round(sum(double),4) itself diverging one grid step on the ~15e9
    yearly totals — the documented order-divergent-sum channel, which
    integer units close at every scale."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    vol_u = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume_u", vol_u)
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_9", F.col("volume_u"))
                    .otherwise(F.lit(0))
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.lit(10000.0)
            ).alias("nation_volume"),
            (F.sum(F.col("volume_u").cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias(
                "total_volume"
            ),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 4) AS c_acctbal
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting: quarter scan + returnflag
    filter -> 4-way join -> top-20 by lost revenue."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = _t(spark, sf_dir, "nation")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 4).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q12",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late_count,
           count(*) AS total_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape, adapted: the testdata lacks l_shipmode/
    l_commitdate/l_receiptdate, so 'late' is l_shipdate more than 60
    days after o_orderdate and the rollup key is o_orderpriority —
    same plan shape (fact-fact join + conditional counts)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(late, 1)).alias("late_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q19",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1  AND l_quantity <= 21)
       OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape, adapted: disjunctive multi-branch predicate
    over join + scan columns (p_container/l_shipmode absent -> brand/
    size/quantity branches). The disjunction references both sides, so
    Catalyst evaluates it post-join while still pushing the common
    p_partkey equi-key — the classic Q19 plan. Revenue is an exact
    integer-cent sum: round(sum(float), 4) diverged between engines at
    the 10x replica (sum ~8e9 -> partial-sum order error > the 4dp
    grid), while per-row cents then a BIGINT sum is scale-invariant —
    found by the r5 10x differential."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#16") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("revenue_cents")
        )
    )


# --- ML differential checks (VERDICT r1 "missing" item 2: M2/M3 had no
# driver-checkable signal). Iterative GBT training is not
# SQL-expressible, but construction invariants are: a seeded regressor
# scored on its training data cannot lose to the mean baseline
# (rmse <= stddev_pop), and a seeded classifier cannot lose to the
# majority class. The oracle pins row counts + the invariants, so the
# driver row verifies the full distributed fit+score pipeline ran.


@register(
    "ml_gbt_regression_eval",
    "SELECT count(*) AS n_rows, true AS rmse_le_std, true AS preds_finite FROM events",
)
def ml_gbt_regression_eval(spark, sf_dir):
    """M2 (reference LightGBM regression, database_and_model_tools.py:
    117-139) as distributed MLlib GBT: fit on event features, score the
    training set, emit oracle-checkable invariants. maxIter kept small:
    the check is the distributed pipeline, not model quality."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    e = _t(spark, sf_dir, "events").select(
        F.col("value").alias("label"),
        F.hour("ts").cast("double").alias("f_hour"),
        (F.col("user_id") % 10).cast("double").alias("f_usermod"),
        F.dayofweek("ts").cast("double").alias("f_dow"),
    )
    feats = VectorAssembler(
        inputCols=["f_hour", "f_usermod", "f_dow"], outputCol="features"
    ).transform(e)
    model = GBTRegressor(
        featuresCol="features", labelCol="label", maxIter=5, maxDepth=3, seed=42
    ).fit(feats)
    scored = model.transform(feats)
    return scored.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sqrt(F.avg(F.pow(F.col("prediction") - F.col("label"), 2)))
            <= F.stddev_pop("label")
        ).alias("rmse_le_std"),
        (F.count(F.when(F.isnan("prediction") | F.col("prediction").isNull(), 1)) == 0).alias(
            "preds_finite"
        ),
    )


@register(
    "ml_gbt_classifier_eval",
    "SELECT count(*) AS n_rows, true AS acc_ge_majority FROM events",
)
def ml_gbt_classifier_eval(spark, sf_dir):
    """M3 (reference binary classifiers) as distributed MLlib GBT:
    conversion prediction (purchase/signup vs rest) with the
    train-accuracy >= majority-class invariant as the driver check."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").isin("purchase", "signup").cast("double").alias("label"),
        F.hour("ts").cast("double").alias("f_hour"),
        (F.col("user_id") % 10).cast("double").alias("f_usermod"),
        F.col("value").alias("f_value"),
    )
    feats = VectorAssembler(
        inputCols=["f_hour", "f_usermod", "f_value"], outputCol="features"
    ).transform(e)
    model = GBTClassifier(
        featuresCol="features", labelCol="label", maxIter=5, maxDepth=3, seed=42
    ).fit(feats)
    scored = model.transform(feats)
    acc = F.avg((F.col("prediction") == F.col("label")).cast("double"))
    majority = F.greatest(F.avg("label"), 1 - F.avg("label"))
    return scored.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (acc >= majority).alias("acc_ge_majority"),
    )


# --- JSON-lines file source -------------------------------------------------


@register(
    "ext_source_jsonl",
    """
    SELECT count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events WHERE event_type = 'purchase'
    """,
)
def ext_source_jsonl(spark, sf_dir):
    """JSON-lines source round trip: write a deterministic events
    projection as JSONL, read it back with spark.read.json under an
    explicit schema (schema inference is a scan you don't pay twice at
    100 TB), and emit digests the oracle recomputes from the parquet
    view — same robustness pattern as the sink checks."""
    import tempfile

    path = tempfile.mkdtemp(prefix="jsonl_src_") + "/events"
    src = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", F.round(F.col("value") * 100).cast("long").alias("cents"))
    )
    src.write.mode("overwrite").json(path)
    back = spark.read.schema("event_id long, cents long").json(path)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum("cents").alias("sum_cents"),
    )


# --- hypertable-style multi-granularity rollup ------------------------------


@register(
    "ext_time_rollup",
    """
    SELECT CASE WHEN grouping(day_b) = 0 THEN 'day'
                WHEN grouping(week_b) = 0 THEN 'week'
                ELSE 'month' END AS gran,
           CAST(floor(epoch(coalesce(day_b, week_b, month_b))) AS BIGINT) AS bucket_epoch,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM (
      SELECT value,
             date_trunc('day', ts)   AS day_b,
             date_trunc('week', ts)  AS week_b,
             date_trunc('month', ts) AS month_b
      FROM events
    )
    GROUP BY GROUPING SETS ((day_b), (week_b), (month_b))
    """,
)
def ext_time_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: one scan, three time
    granularities (day/week/month) via GROUPING SETS over precomputed
    buckets — the multi-resolution rollup a telemetry store
    materializes. Single pass + partial aggregation per set; at 100 TB
    this replaces three separate scans with one."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT CASE WHEN grouping(day_b) = 0 THEN 'day'
                    WHEN grouping(week_b) = 0 THEN 'week'
                    ELSE 'month' END AS gran,
               CAST(unix_timestamp(coalesce(day_b, week_b, month_b)) AS BIGINT)
                 AS bucket_epoch,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM (
          SELECT value,
                 date_trunc('day', ts)   AS day_b,
                 date_trunc('week', ts)  AS week_b,
                 date_trunc('month', ts) AS month_b
          FROM events
        )
        GROUP BY GROUPING SETS ((day_b), (week_b), (month_b))
        """
    )


# --- ORC file source --------------------------------------------------------


@register(
    "ext_source_orc",
    """
    SELECT count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events WHERE event_type = 'error'
    """,
)
def ext_source_orc(spark, sf_dir):
    """ORC source round trip (second columnar format beside parquet):
    deterministic events projection written as ORC, read back, digest
    aggregates checked against the parquet view — DuckDB never needs to
    read ORC, only recompute the digests from the logical source."""
    import tempfile

    path = tempfile.mkdtemp(prefix="orc_src_") + "/events"
    src = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", F.round(F.col("value") * 100).cast("long").alias("cents"))
    )
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum("cents").alias("sum_cents"),
    )


# --- higher-order array functions -------------------------------------------


@register(
    "ext_higher_order_funcs",
    """
    SELECT doc_id,
           len(list_filter(ws, x -> x <> '')) AS n_words,
           len(list_filter(ws, x -> length(x) > 4)) AS n_long_words,
           CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS total_chars,
           len(list_filter(ws, x -> regexp_matches(x, '[0-9]'))) > 0 AS has_digit,
           array_to_string(list_transform(list_slice(ws, 1, 3), x -> upper(x)), ' ')
             AS first3_upper
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    """,
)
def ext_higher_order_funcs(spark, sf_dir):
    """Higher-order array functions (transform / filter / exists /
    aggregate / slice): lambda expressions evaluated INSIDE codegen on
    the JVM — the declarative alternative to a Python UDF for per-row
    collection logic, and the idiom the similarity ops build on."""
    d = _t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(ws, lambda x: x != "")).alias("n_words"),
        F.size(F.filter(ws, lambda x: F.length(x) > 4)).alias("n_long_words"),
        F.aggregate(
            ws, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("total_chars"),
        F.exists(ws, lambda x: x.rlike("[0-9]")).alias("has_digit"),
        F.array_join(
            F.transform(F.slice(ws, 1, 3), lambda x: F.upper(x)), " "
        ).alias("first3_upper"),
    )


# --- streaming foreachBatch sink (oracle-checked digest round trip) ---------


@register(
    "stream_foreach_batch_sink",
    """
    SELECT count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events WHERE event_type = 'view'
    """,
)
def stream_foreach_batch_sink(spark, sf_dir):
    """Streaming foreachBatch sink (M7 continuous orchestration): the
    events stream is filtered and appended to a parquet table per
    micro-batch (availableNow drain), then the table is read back and
    digest-checked against the batch view of the same source — proving
    the streaming ingest path writes exactly the batch-equivalent
    rows."""
    import tempfile

    from .session import tune_session
    from .streaming.windows import events_testdata_stream, foreach_batch_append

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="stream_fb_out_")
    stream = (
        events_testdata_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("event_id", F.round(F.col("value") * 100).cast("long").alias("cents"))
    )
    q = foreach_batch_append(stream, f"{work}/t", f"{work}/ckpt")
    q.awaitTermination()
    back = spark.read.parquet(f"{work}/t")
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum("cents").alias("sum_cents"),
    )


# --- remaining subquery shapes ----------------------------------------------


@register(
    "ext_not_in_subquery",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)
    ORDER BY c_custkey
    """,
)
def ext_not_in_subquery(spark, sf_dir):
    """NOT IN subquery — planned as a null-aware anti join. The inner
    side is explicitly NULL-filtered: SQL NOT IN returns no rows if the
    subquery yields ANY null (three-valued logic), which is the classic
    silent-empty-result trap; filtering nulls pins the intended
    anti-join semantics in both engines."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)
        ORDER BY c_custkey
        """
    )


@register(
    "ext_lateral_join",
    """
    SELECT r_name, n_name, n_customers FROM region,
    LATERAL (
      SELECT n_name, count(c_custkey) AS n_customers
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      WHERE n_regionkey = r_regionkey
      GROUP BY n_name
      ORDER BY n_customers DESC, n_name ASC
      LIMIT 2
    )
    ORDER BY r_name, n_customers DESC, n_name
    """,
)
def ext_lateral_join(spark, sf_dir):
    """LATERAL correlated subquery (top-2 nations per region by
    customer count): Catalyst decorrelates the per-row subquery into a
    join + windowed rank rather than re-executing it per outer row —
    the scale-relevant property of LATERAL support."""
    _views(spark, sf_dir, "region", "nation", "customer")
    return spark.sql(
        """
        SELECT r_name, n_name, n_customers FROM region,
        LATERAL (
          SELECT n_name, count(c_custkey) AS n_customers
          FROM nation JOIN customer ON c_nationkey = n_nationkey
          WHERE n_regionkey = r_regionkey
          GROUP BY n_name
          ORDER BY n_customers DESC, n_name ASC
          LIMIT 2
        )
        ORDER BY r_name, n_customers DESC, n_name
        """
    )


@register(
    "ext_percentile_approx_check",
    """
    SELECT count(*) AS n, true AS p50_close, true AS p95_close FROM lineitem
    """,
)
def ext_percentile_approx_check(spark, sf_dir):
    """Approximate percentile (t-digest-style mergeable sketch — the
    100 TB path next to exact percentile_cont): driver-checkable via an
    accuracy invariant, |approx - exact| within 1% of the exact value
    at accuracy=10000. The approx algorithm is engine-specific (no
    DuckDB twin), but the bound is constant-true by construction when
    the sketch works."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("a95"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
    )
    return agg.select(
        "n",
        (F.abs(F.col("a50") - F.col("e50")) <= F.abs(F.col("e50")) * 0.01).alias("p50_close"),
        (F.abs(F.col("a95") - F.col("e95")) <= F.abs(F.col("e95")) * 0.01).alias("p95_close"),
    )


@register(
    "tpch_q13",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer-distribution: left join preserving
    order-less customers, two-level aggregation (per-customer count,
    then histogram of counts — both partial-aggregable)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q18",
    """
    SELECT c_custkey, o_orderkey,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch,
           round(o_totalprice, 4) AS o_totalprice,
           round(sum(l_quantity), 4) AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 210
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume-customer: HAVING-filtered aggregate as a
    semi-join input (the IN-subquery plans as LeftSemi on the
    pre-aggregated lineitem — the aggregate shrinks the build side
    before the join, the shape that matters at scale)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 210)
        .select("l_orderkey")
    )
    # semi-filter orders FIRST: the HAVING aggregate shrinks the fact
    # side before the expensive customer/lineitem joins run
    o_big = o.join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    joined = c.join(o_big, c.c_custkey == o_big.o_custkey).join(
        li, o_big.o_orderkey == li.l_orderkey
    )
    return (
        joined.groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("long").alias("o_orderdate_epoch"),
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


_STRAT_FRACTIONS = {
    "click": 0.1,
    "view": 0.1,
    "error": 0.5,
    "purchase": 1.0,
    "signup": 1.0,
}
_STRAT_SPACE = 16**7
_STRAT_THRS = {k: int(v * _STRAT_SPACE) for k, v in _STRAT_FRACTIONS.items()}


def _strat_oracle_sql() -> str:
    from .llm.prep import hex_bucket_sql

    bucket = hex_bucket_sql("md5(CAST(event_id AS VARCHAR))", 7)
    cases = " ".join(
        f"WHEN '{k}' THEN {thr}" for k, thr in sorted(_STRAT_THRS.items())
    )
    return f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled
    FROM events
    WHERE {bucket} < (CASE event_type {cases} ELSE 0 END)
    GROUP BY event_type
    """


@register("ext_sample_stratified", _strat_oracle_sql())
def ext_sample_stratified(spark, sf_dir):
    """Stratified sampling: per-stratum Bernoulli fractions — the
    training-data rebalancing idiom (downsample dominant event types,
    keep all rare ones). Re-specced (r7 verdict item 5) from seeded
    sampleBy (engine-specific RNG, rows-only forever) to per-stratum
    HASH thresholds: keep iff md5_bucket(event_id, 7) < frac_k * 16^7
    for the row's stratum k. Same contract as sampleBy, but the draw
    is a pure function of the key — reproducible across runs, engines,
    and cluster sizes (the resume-safe shape a 100 TB rebalance
    needs), so the oracle runs the identical hex arithmetic and the
    check is exact. The threshold rides a broadcast CASE over 5
    literals; no join, no shuffle before the rollup."""
    from .llm.prep import md5_bucket

    e = _t(spark, sf_dir, "events")
    thr = F.lit(0)
    for k, t in sorted(_STRAT_THRS.items()):
        thr = F.when(F.col("event_type") == k, F.lit(t)).otherwise(thr)
    s = e.filter(md5_bucket(F.col("event_id"), 7) < thr)
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled")
    )


@register(
    "ext_join_hinted",
    """
    SELECT n_name, count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def ext_join_hinted(spark, sf_dir):
    """SQL join-strategy hint surface: /*+ BROADCAST(nation) */ pins
    the dim broadcast from SQL text (the knob users reach for when
    statistics mislead the planner). Results are hint-invariant —
    the oracle is the plain join."""
    _views(spark, sf_dir, "supplier", "nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


# --- stream-stream join ------------------------------------------------------


@register(
    "stream_stream_join",
    """
    SELECT c.user_id,
           c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream inner join (clicks joined to purchases by the
    same user within 30 minutes AFTER the click): both sides
    watermarked, the time-range join condition bounds each side's
    state retention — without it stream-stream state grows forever.
    Drained with availableNow; the ORACLE is the equivalent batch
    interval self-join, proving the streaming state machine computes
    the relational answer."""
    import uuid

    from .session import tune_session
    from .streaming.windows import events_testdata_stream

    tune_session(spark)

    def side(event_type, alias):
        return (
            events_testdata_stream(spark, sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user_id"),
                F.col("event_id").alias(f"{alias}_event_id"),
                F.col("ts").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "2 hours")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    joined = clicks.join(
        purchases,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        F.col("c_user_id").alias("user_id"),
        F.col("c_event_id").alias("click_id"),
        F.col("p_event_id").alias("purchase_id"),
        F.unix_timestamp("c_ts").cast("long").alias("click_epoch"),
        F.unix_timestamp("p_ts").cast("long").alias("purchase_epoch"),
    )
    name = f"stream_ss_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- operational write-path ops ---------------------------------------------


@register(
    "ext_compact_small_files",
    """
    SELECT count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           true AS fewer_files
    FROM events
    """,
)
def ext_compact_small_files(spark, sf_dir):
    """Small-file compaction — the operational fix for the classic
    100 TB killer (a streaming sink or over-parallel writer leaving
    thousands of KB-sized files that make every scan metadata-bound).
    Write events as 64 shards, compact to 4 with a coalesce rewrite
    (coalesce, not repartition: no shuffle, just fewer write tasks),
    and verify the data digest survived and the file count dropped."""
    import glob
    import tempfile

    work = tempfile.mkdtemp(prefix="compact_")
    src = _t(spark, sf_dir, "events").select("event_id")
    src.repartition(64).write.parquet(f"{work}/small")
    n_small = len(glob.glob(f"{work}/small/part-*.parquet"))
    spark.read.parquet(f"{work}/small").coalesce(4).write.parquet(f"{work}/compact")
    n_compact = len(glob.glob(f"{work}/compact/part-*.parquet"))
    back = spark.read.parquet(f"{work}/compact")
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_event_id"),
        F.lit(n_compact < n_small).alias("fewer_files"),
    )


@register(
    "ext_dynamic_partition_overwrite",
    """
    SELECT event_type, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def ext_dynamic_partition_overwrite(spark, sf_dir):
    """Dynamic partition overwrite (the warehouse backfill semantic):
    rewriting ONE partition replaces only that partition — sibling
    partitions are untouched. The events table is written partitioned
    by event_type; the 'click' partition is then overwritten with the
    same rows in dynamic mode; the oracle's per-type counts hold iff
    no other partition was clobbered (static mode would have wiped
    them)."""
    import tempfile

    work = tempfile.mkdtemp(prefix="dpo_") + "/t"
    e = _t(spark, sf_dir, "events").select("event_id", "event_type")
    e.write.partitionBy("event_type").parquet(work)
    clicks = e.filter(F.col("event_type") == "click")
    (
        clicks.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(work)
    )
    back = spark.read.parquet(work)
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# --- set-op ALL variants + malformed-input handling -------------------------


@register(
    "ext_intersect_all",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def ext_intersect_all(spark, sf_dir):
    """INTERSECT ALL: bag semantics — a user appearing 3x among clicks
    and 2x among views survives twice (min of multiplicities), vs the
    distinct INTERSECT's once."""
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    return a.intersectAll(b)


@register(
    "ext_except_all",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def ext_except_all(spark, sf_dir):
    """EXCEPT ALL: bag difference — multiplicities subtract instead of
    the distinct EXCEPT's set removal."""
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return a.exceptAll(b)


@register(
    "ext_source_csv_corrupt",
    """
    SELECT * FROM (VALUES
      (CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(6 AS BIGINT))
    ) t(n_good, n_corrupt, n_rows)
    """,
)
def ext_source_csv_corrupt(spark, sf_dir):
    """Malformed-input handling (PERMISSIVE mode): rows that fail the
    schema land in columnNameOfCorruptRecord instead of killing the
    job — the property that matters when 100 TB of vendor CSV has a
    bad row every million. Payload: 3 good rows, 2 type-corrupt, 1
    short row; ALL THREE malformed rows are captured (Spark 4 treats
    short rows as corrupt too), and no row is silently dropped
    (n_rows = 6)."""
    import tempfile

    path = tempfile.mkdtemp(prefix="csv_corrupt_") + "/data.csv"
    with open(path, "w") as f:
        f.write("id,qty,price\n")
        f.write("1,10,1.5\n")
        f.write("2,20,2.5\n")
        f.write("3,30,3.5\n")
        f.write("4,notanumber,4.5\n")   # type-corrupt -> _corrupt_record
        f.write("5,50,alsobad\n")        # type-corrupt -> _corrupt_record
        f.write("6,60\n")                # short row -> corrupt in Spark 4 PERMISSIVE (not null-padded)
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema("id long, qty long, price double, _bad string")
        .csv(path)
    )
    df = df.cache()
    return df.agg(
        F.count(F.when(F.col("_bad").isNull(), 1)).alias("n_good"),
        F.count(F.col("_bad")).alias("n_corrupt"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "ext_collect_list_ordered",
    """
    SELECT user_id,
           array_to_string(list(event_type ORDER BY ts, event_id), '>') AS type_path,
           count(*) AS n_events,
           (list(event_type ORDER BY ts, event_id))[1] AS first_type,
           (list(event_type ORDER BY ts, event_id))[-1] AS last_type
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    """,
)
def ext_collect_list_ordered(spark, sf_dir):
    """Deterministic ordered array aggregation: collect_list gives NO
    ordering guarantee (it concatenates partition-arrival order), so
    the portable idiom is collect structs carrying the sort key, then
    sort_array + transform to project the payload — equal to SQL's
    list(x ORDER BY ...) in any engine. The per-user event-type PATH is
    the sessionized-journey shape downstream sequence models consume.
    Output projects the ordered array to scalar columns (joined path,
    ends, length) — the driver's canonicalizer cannot hash raw array
    cells (round-3 lesson from llm_embedding_truncate). The sort key
    is exact epoch-MICROS (unix_timestamp's whole seconds would let
    sub-second orderings diverge from the oracle's full-resolution
    ORDER BY ts)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    seq = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("t"),
                )
            )
        ),
        lambda s: s["t"],
    )
    return e.groupBy("user_id").agg(
        F.array_join(seq, ">").alias("type_path"),
        F.count(F.lit(1)).alias("n_events"),
        F.element_at(seq, 1).alias("first_type"),
        F.element_at(seq, -1).alias("last_type"),
    )


@register(
    "ext_manifest_pruned_scan",
    """
    SELECT event_id, user_id, round(value, 4) AS value
    FROM events WHERE user_id BETWEEN 40 AND 60
    """,
)
def ext_manifest_pruned_scan(spark, sf_dir):
    """Metadata-pruned scan end to end: events written Z-ordered on
    (user_id, value), a file-level min/max manifest built over it, and
    the range read resolved through the manifest (only overlapping
    files opened — operators/manifest.py). The oracle is the plain
    relational filter: pruning must be invisible in the answer."""
    import tempfile

    from .operators.layout import zorder_write
    from .operators.manifest import build_manifest, pruned_read

    work = tempfile.mkdtemp(prefix="manifest_scan_")
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zorder_write(e, "user_id", "value", f"{work}/t", num_files=8)
    build_manifest(spark, f"{work}/t", ["user_id"], f"{work}/m")
    out = pruned_read(spark, f"{work}/t", f"{work}/m", "user_id", 40, 60)
    return out.select("event_id", "user_id", F.round("value", 4).alias("value"))


@register(
    "ext_recursive_cte",
    """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < DATE '2001-08-01'
    )
    SELECT CAST(floor(epoch(m)) AS BIGINT) AS month_epoch,
           count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders
      ON date_trunc('month', o_orderdate) = CAST(m AS TIMESTAMP)
    GROUP BY m
    """,
)
def ext_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE): the calendar-spine
    idiom — generate every month in the data range recursively, left
    join facts so empty months survive with count 0. The recursion is
    driver-bounded (one row per month), the join and aggregate stay
    distributed."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
          WHERE m < DATE '2001-08-01'
        )
        SELECT CAST(unix_timestamp(CAST(m AS TIMESTAMP)) AS BIGINT) AS month_epoch,
               count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON date_trunc('month', o_orderdate) = CAST(m AS TIMESTAMP)
        GROUP BY m
        """
    )


@register(
    "ext_variant_json",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k
    FROM events GROUP BY event_type
    """,
)
def ext_variant_json(spark, sf_dir):
    """VARIANT semi-structured type (Spark 4): parse_json once into a
    binary-encoded variant, then typed variant_get extraction — the
    shredding-friendly path for JSON at scale (vs re-parsing strings
    per access, which ext_json_extract's get_json_object does)."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
    )


@register(
    "ext_sql_udf",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                AS DOUBLE) / 10000 AS net_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_sql_udf(spark, sf_dir):
    """SQL-body scalar UDF (CREATE FUNCTION ... RETURN expr, Spark 4):
    the function inlines into the plan as a plain expression — full
    codegen, no Python boundary — which is why the oracle is the
    inlined arithmetic. The UDF returns exact e4 integer units
    (cents x discount-cents) so the per-group revenue folds as an
    exact DECIMAL(38,0) sum (oracle_audit: the old round(sum(double),
    4) had ~1e11 group sums at 10x — the tpch_q19 float-grid class)."""
    _views(spark, sf_dir, "lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price_e4(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(p * 100 + 0.5) AS BIGINT) "
        "* (100 - CAST(floor(d * 100 + 0.5) AS BIGINT))"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(CAST(net_price_e4(l_extendedprice, l_discount)
                             AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS net_revenue
        FROM lineitem GROUP BY l_returnflag
        """
    )


@register(
    "ext_approx_top_k",
    """
    SELECT word AS item, count(*) AS cnt FROM (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      FROM documents
    ) GROUP BY word ORDER BY cnt DESC, item ASC LIMIT 5
    """,
)
def ext_approx_top_k(spark, sf_dir):
    """Heavy-hitters sketch (Spark 4 approx_top_k): mergeable
    frequency sketch — the cardinality-bounded path for 'top terms
    over 100 TB of text' where an exact word count's shuffle is the
    bottleneck. At this vocabulary size (31 synthetic words) the
    sketch is exact, so the ORACLE is the exact top-5 — on real heavy-
    tailed data the counts are approximate and the check would be an
    invariant instead."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).alias("w")
    )
    top = words.agg(F.expr("approx_top_k(w, 5)").alias("tk")).select(
        F.explode("tk").alias("e")
    )
    return top.select(
        F.col("e.item").alias("item"), F.col("e.count").alias("cnt")
    ).orderBy(F.col("cnt").desc(), F.col("item").asc())


@register(
    "tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 top-supplier: a named aggregate reused twice (the
    revenue CTE feeds both the scalar max and the equality filter) —
    Catalyst plans the CTE once and reuses the exchange; the scalar
    subquery broadcasts one value."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )


@register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11' AND p_size IN (1, 5, 9, 13, 17)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape, adapted: the testdata has no partsupp, so the
    supplier relationship comes from lineitem — same plan (selective
    dim filter -> join -> DISTINCT count grouped by part attributes,
    the two-shuffle exact-distinct path)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11") & F.col("p_size").isin(1, 5, 9, 13, 17)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17",
    """
    SELECT CAST(sum(CAST(round(l1.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / 700.0 AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#11'
      AND l1.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey
      )
    """,
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 small-quantity-order: correlated scalar AVG per part.
    Expressed as an explicit pre-aggregated join (the decorrelation
    Catalyst performs anyway): one partial-aggregable avg per part,
    broadcast-joined back — never a per-row subquery execution. The
    revenue sum rides integer cents (r11): round(sum(double)/7, 4)
    landed one 4dp step apart across engines at the 100x probe
    (…802.0001 vs …801.9999 — an order-divergent ~4.6e11-cent sum
    straddling the grid); exact cents in DECIMAL(38,0) then ONE
    display division by 700.0 (an exactly-representable <2^53 integer
    over the same IEEE op) is bitwise-equal on both engines, no
    round() anywhere. The correlated half-avg predicate compares raw
    doubles on both sides unchanged — quantity sums are small
    integers, exact in double at any scale."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    avg_qty = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty.withColumnRenamed("l_partkey", "p_partkey"), "p_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
    )
    return joined.agg(
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long").cast("decimal(38,0)"))
            .cast("double")
            / F.lit(700.0)
        ).alias("avg_yearly")
    )


@register(
    "tpch_q21",
    """
    SELECT s_name, count(*) AS numwait FROM (
      SELECT DISTINCT s_name, l1.l_orderkey, l1.l_suppkey
      FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
        )
    )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 waiting-suppliers shape, adapted ('late' =
    l_shipdate > o_orderdate + 60 days since the testdata lacks
    commit/receipt dates): the EXISTS / NOT EXISTS pair over lineitem
    self-joins — planned as a left-semi then left-anti join against
    the same scan, the classic decorrelation."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait FROM (
          SELECT DISTINCT s_name, l1.l_orderkey, l1.l_suppkey
          FROM supplier
            JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            JOIN orders ON o_orderkey = l1.l_orderkey
          WHERE o_orderstatus = 'F'
            AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
            AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
            )
            AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
            )
        )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


@register(
    "tpch_q22",
    """
    SELECT c_custkey, round(c_acctbal, 4) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
      )
    ORDER BY c_custkey
    """,
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 global-sales-opportunity shape, adapted: every
    customer in this data has SOME order (making the classic NOT
    EXISTS vacuous), so 'inactive' means no order since mid-2000 —
    same plan (scalar avg subquery filter + anti join)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 4) AS c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
          )
        ORDER BY c_custkey
        """
    )


@register(
    "ext_window_time_range_frame",
    """
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           CAST(sum(cents) OVER w AS BIGINT) AS cents_last_hour
    FROM (SELECT event_id, user_id, ts,
                 CAST(round(value * 100) AS BIGINT) AS cents FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def ext_window_time_range_frame(spark, sf_dir):
    """Time-interval RANGE frame (rolling 1-hour totals per user) —
    the event-time sliding aggregate as a window function, distinct
    from the numeric-offset range frame (ext_window_range_frame) and
    from bucketed sliding windows (the frame is anchored per ROW, not
    per bucket). Exact integer cents keep the frame sums
    engine-identical; ties in ts share a frame by RANGE semantics, so
    no tiebreak is needed for determinism."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               count(*) OVER w AS n_last_hour,
               CAST(sum(cents) OVER w AS BIGINT) AS cents_last_hour
        FROM (SELECT event_id, user_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "tpch_q2",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM cost GROUP BY l_partkey)
    SELECT p_partkey, s_suppkey, s_name, c.unit_cost AS unit_cost
    FROM part
      JOIN cost c ON c.l_partkey = p_partkey
      JOIN best b ON b.l_partkey = p_partkey AND c.unit_cost = b.min_cost
      JOIN supplier ON s_suppkey = c.l_suppkey
    WHERE p_size = 10
    ORDER BY p_partkey, s_suppkey
    """,
)
def tpch_q2(spark, sf_dir):
    """TPC-H Q2 minimum-cost-supplier shape, adapted (no partsupp:
    unit cost observed from lineitem): per-(part,supplier) min cost,
    then the per-part minimum joined BACK on equality — the
    min-per-group + join-back decorrelation, distinct from Q17's
    filter-below-average."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 10).select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = (
        p.join(cost, p.p_partkey == cost.l_partkey)
        .join(best, (F.col("b_partkey") == F.col("p_partkey")) & (F.col("unit_cost") == F.col("min_cost")))
        .join(s, s.s_suppkey == cost.l_suppkey)
    )
    # unit_cost is returned UNROUNDED: each per-row division of the
    # same stored doubles is bit-identical on both engines and MIN is
    # order-independent, so the raw double hash-matches at any SF —
    # while round(x, 4) sat exactly on a .5 grid point at the 10x
    # replica and flipped between the engines' rounding algorithms
    # (found by the r5 10x differential).
    return out.select(
        "p_partkey", "s_suppkey", "s_name", "unit_cost"
    ).orderBy("p_partkey", "s_suppkey")


@register(
    "tpch_q11",
    """
    WITH value AS (
      SELECT l_suppkey, sum(l_extendedprice * l_quantity) AS v
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, round(v, 4) AS supplier_value
    FROM value
    WHERE v > (SELECT 0.0105 * sum(v) FROM value)
    ORDER BY supplier_value DESC, l_suppkey
    """,
)
def tpch_q11(spark, sf_dir):
    """TPC-H Q11 value-concentration shape, adapted (shipped value
    from lineitem instead of partsupp stock): per-supplier totals
    filtered against a FRACTION of the global total — the aggregate
    reused by both the group rows and the scalar subquery (one CTE,
    planned once)."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        WITH value AS (
          SELECT l_suppkey, sum(l_extendedprice * l_quantity) AS v
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, round(v, 4) AS supplier_value
        FROM value
        WHERE v > (SELECT 0.0105 * sum(v) FROM value)
        ORDER BY supplier_value DESC, l_suppkey
        """
    )


@register(
    "tpch_q9",
    """
    SELECT nation, o_year, CAST(sum(amount_u) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               - 60 * CAST(round(p_retailprice * 100) AS BIGINT)
                    * CAST(round(l_quantity) AS BIGINT) AS amount_u
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 product-type-profit shape, adapted: the testdata has no
    partsupp table, so supply cost is a deterministic proxy
    (0.6 * p_retailprice) instead of ps_supplycost — the plan shape
    (part-name LIKE filter driving a 5-way star join, profit expression,
    nation x year rollup, descending-year sort) is Q9's. part (2k rows
    filtered to ~13%), supplier (100) and nation (25) broadcast; the
    only shuffles are the lineitem-orders fact-fact join and the final
    aggregation. Profit rides integer 1e-4-dollar units (r11): every
    input is an exact small decimal (prices 2dp -> cents, discount 2dp
    -> pct, quantity integral — all verified on the testdata), so
    amount_u = cents x (100-pct) - 60 x retail_cents x qty is an exact
    BIGINT per row; round(sum(double),4) on the raw expression
    diverged one 4dp step per nation-year at the r11 100x probe (the
    order-divergent-sum channel on ~2e9-dollar groups), while the
    DECIMAL(38,0) sum + one display division is bitwise-equal at
    every scale."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount_u = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    ) - F.lit(60) * F.round(F.col("p_retailprice") * 100).cast("long") * F.round(
        F.col("l_quantity")
    ).cast("long")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount_u.alias("amount_u"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum(F.col("amount_u").cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "tpch_q20",
    """
    WITH per AS (
      SELECT l_suppkey,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_1996,
             sum(l_quantity) AS qty_total
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
      GROUP BY l_suppkey
    )
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN per ON s_suppkey = l_suppkey
    WHERE qty_1996 > CAST(0.17 AS DOUBLE) * qty_total
    ORDER BY s_name
    """,
)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 potential-part-promotion shape, adapted: partsupp's
    ps_availqty is absent from the testdata, so the excess-stock
    predicate becomes shipped-quantity concentration — suppliers whose
    1996 shipments of 'red' parts exceed 17% of their all-time total
    (non-vacuous: 33 of 100 suppliers at sf0.01). The shape survives:
    name-LIKE part filter driving a semi-join-reducible aggregate over
    lineitem, a threshold comparing two sums of the same aggregate, and
    the supplier name listing. part broadcast into the fact scan; one
    shuffle for the per-supplier aggregate; supplier (100 rows)
    broadcast into the result."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_1996 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    per = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(F.lit(0))).alias(
                "qty_1996"
            ),
            F.sum("l_quantity").alias("qty_total"),
        )
        .filter(F.col("qty_1996") > F.lit(0.17) * F.col("qty_total"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        per.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "ext_merge_upsert",
    """
    WITH target AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
    ),
    source AS (
      SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice
      FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1500
    ),
    merged AS (
      SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
             coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice
      FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    )
    SELECT count(*) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
           round(sum(o_totalprice), 2) AS sum_total
    FROM merged
    """,
)
def ext_merge_upsert(spark, sf_dir):
    """MERGE INTO / upsert semantics on plain parquet (no Delta in this
    container): WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT,
    expressed as a full-outer join with source-wins coalesce and an
    atomic table rewrite. The digest (count + key/price sums) is
    recomputed by the oracle from the logical inputs, so the check
    covers both the merge semantics and the write-read round trip.
    At scale the join shuffles on the merge key — the same plan Delta's
    MERGE produces for the matched partition set."""
    import tempfile

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    target = o.filter(F.col("o_orderkey") < 1000)
    source = o.filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1500)).select(
        "o_orderkey", (F.col("o_totalprice") + 10.0).alias("o_totalprice")
    )
    path = tempfile.mkdtemp(prefix="merge_") + "/t"
    target.write.mode("overwrite").parquet(path)

    tgt = spark.read.parquet(path).alias("t")
    src = source.alias("s")
    merged = tgt.join(src, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full_outer").select(
        F.coalesce(F.col("s.o_orderkey"), F.col("t.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("s.o_totalprice"), F.col("t.o_totalprice")).alias("o_totalprice"),
    )
    out_path = tempfile.mkdtemp(prefix="merge_out_") + "/t"
    merged.write.mode("overwrite").parquet(out_path)
    back = spark.read.parquet(out_path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("sum_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    )


@register(
    "ext_funnel_conversion",
    """
    WITH ev AS (
      -- truncate to microseconds: Spark reads the nanos column as
      -- micros, so sub-microsecond components (none in current
      -- testdata, but possible in a future SF dir) must not decide
      -- strict comparisons only on the DuckDB side
      SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events
    ),
    v AS (
      SELECT user_id, min(ts) AS t0 FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t0
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t1
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def ext_funnel_conversion(spark, sf_dir):
    """Ordered funnel analysis (view -> click -> purchase): each stage
    counts users whose earliest qualifying event strictly follows their
    previous stage's earliest event. Three filtered aggregates chained
    by equi-joins on user_id — every stage partial-aggregable, no
    window over the full event stream, no timestamp in the output (the
    nanos column stays internal)."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t0"))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@register(
    "ext_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week FROM events
    )
    SELECT CAST(epoch(cohort_week) AS BIGINT) AS cohort_epoch,
           CAST((epoch(activity_week) - epoch(cohort_week)) // 604800 AS BIGINT) AS week_offset,
           count(*) AS n_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
)
def ext_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity week,
    counted per week offset they return in. Two aggregates + one
    equi-join on user_id; weeks are ISO date_trunc (cross-engine
    parity) and surface as epoch BIGINT (engine-portable). The classic
    product-analytics rollup, all partial-aggregable."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            F.unix_timestamp("cohort_week").alias("cohort_epoch"),
            ((F.unix_timestamp("activity_week") - F.unix_timestamp("cohort_week")) / 604800)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_epoch", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "ext_gap_islands",
    """
    WITH ordered AS (
      -- date_trunc microseconds: align the ordering key with Spark's
      -- nanos->micros read (no-op on current testdata)
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY date_trunc('microseconds', ts), event_id) AS rn_type
      FROM events
    ),
    islands AS (
      SELECT user_id, event_type, rn_all - rn_type AS grp, count(*) AS run_len
      FROM ordered GROUP BY user_id, event_type, rn_all - rn_type
    )
    SELECT event_type, count(*) AS n_islands,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           round(avg(run_len), 4) AS avg_run_len
    FROM islands GROUP BY event_type
    """,
)
def ext_gap_islands(spark, sf_dir):
    """Gaps-and-islands: collapse each user's consecutive runs of the
    same event_type into islands via the row_number-difference trick
    (two user-partitioned windows, zero joins), then summarize run
    statistics per type. The canonical sessionless sequence-analysis
    shape; windows partition by user so the plan parallelizes across
    the key space. Deterministic (ts, event_id) tiebreak."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    islands = (
        e.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return islands.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").alias("longest_run"),
        F.round(F.avg("run_len"), 4).alias("avg_run_len"),
    )


@register(
    "ext_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts,
             row_number() OVER (PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY date_trunc('microseconds', ts), event_id) AS rn_type
      FROM events WHERE user_id < 10
    ),
    runs AS (
      SELECT user_id, event_type, min(ts) AS valid_from
      FROM ordered GROUP BY user_id, event_type, rn_all - rn_type
    ),
    hist AS (
      -- event_type tiebreak: two different-type runs can share a
      -- valid_from timestamp (same-microsecond events), and lead()
      -- order must be deterministic in both engines
      SELECT user_id, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
               ORDER BY valid_from, event_type) AS valid_to
      FROM runs
    )
    SELECT user_id, event_type,
           CAST(floor(epoch(valid_from)) AS BIGINT) AS valid_from_epoch,
           CAST(floor(epoch(valid_to)) AS BIGINT) AS valid_to_epoch
    FROM hist
    """,
)
def ext_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: collapse each user's
    consecutive same-type runs (islands), then chain validity windows
    with lead() — open-ended current rows keep NULL valid_to. The
    standard CDC-to-warehouse materialization, expressed as two
    user-partitioned windows + one aggregate; timestamps surface as
    epoch BIGINT (engine-portable). 10-user slice bounds the output."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.min("ts").alias("valid_from"))
    )
    w_hist = Window.partitionBy("user_id").orderBy("valid_from", "event_type")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_hist).alias("valid_to"),
    ).select(
        "user_id",
        "event_type",
        F.unix_timestamp("valid_from").alias("valid_from_epoch"),
        F.unix_timestamp("valid_to").alias("valid_to_epoch"),
    )


@register(
    "ext_salted_join",
    """
    SELECT event_type, count(*) AS n_rows,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT) * wt10) AS BIGINT)
                 / 1000.0, 4) AS weighted_value
    FROM events JOIN (
      SELECT 'click' AS event_type, 10 AS wt10 UNION ALL
      SELECT 'view', 5 UNION ALL
      SELECT 'purchase', 30 UNION ALL
      SELECT 'signup', 20 UNION ALL
      SELECT 'error', 0
    ) w USING (event_type)
    GROUP BY event_type
    """,
)
def ext_salted_join(spark, sf_dir):
    """Skew-safe salted join: event_type has 5 values over the whole
    fact table — the worst-case hot-key join shape. The dim (weights)
    is replicated per salt bucket and each fact row carries a
    deterministic md5-derived salt (operators/bucketing.salted_join),
    spreading every hot key over 8 reducers. Oracle: the plain join —
    the salted result must be EXACTLY equal (sums are exact integer
    deci-cents, so the salt's different addition order cannot move a
    float rounding boundary)."""
    from .operators.bucketing import salted_join

    e = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    weights = spark.createDataFrame(
        [("click", 10), ("view", 5), ("purchase", 30), ("signup", 20), ("error", 0)],
        "event_type string, wt10 long",
    )
    joined = salted_join(e, weights, "event_type", fact_salt_col="event_id")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("cents") * F.col("wt10")) / 1000.0, 4).alias("weighted_value"),
    )
