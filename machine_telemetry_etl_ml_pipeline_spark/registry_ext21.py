"""Twenty-first extension batch (round 6, part 6): warehouse customer
analytics and classifier-evaluation statistics.

- `ext_rfm_segmentation`: the classic Recency/Frequency/Monetary
  customer segmentation — per-customer recency days, order count and
  lifetime cents are scored into quintiles with `ntile(5)` under a
  TOTAL order (metric, custkey), then mapped to named segments. The
  per-segment rollup ships exact integer counts/cents plus one IEEE
  division for the average.
- `ext_abc_classification`: ABC (Pareto) inventory classification of
  parts by cumulative revenue share — the 80/95 class boundaries are
  integer cross-multiplications (`cum*5 <= total*4`), never a float
  percentage, so the classes are exact at any SF.
- `ml_anova_oneway`: one-way ANOVA F-test of account balance across
  market segments. Per-group n / sum-cents / sum-cents^2 accumulate
  in DECIMAL(38,0); the between-group term sum(s_g^2/n_g) is a
  sequential fold in segment order (the ml_average_precision
  doctrine — identical running-window op tree both engines); F is a
  single IEEE formula over those terms, shipped unrounded.
- `ml_matthews_corrcoef`: MCC for the fixed price-threshold
  urgent-order classifier. Confusion counts are exact integers; the
  numerator tp*tn - fp*fn lives in DECIMAL(38,0) (fits at any SF);
  the denominator multiplies the two pairwise-product doubles before
  one sqrt — the same pinned tree both engines.
- `ml_brier_score`: Brier score (mean squared probability error) for
  a deterministic e4-grid price score predicting urgency. Per-row
  squared errors are exact e8 integers summed in DECIMAL(38,0); the
  score is ONE division at the end.

Determinism contract: every data-volume aggregate is an exact
integer (half-up cents, counts, e4 probability grid); doubles are
single fixed IEEE formulas over exact integers or sequential folds
over the 5-row segment table. Reference analog: none (beyond the
reference surface; the RFM/ABC pair extends the warehouse-analytics
family, the metrics extend ml_confusion_matrix / ml_roc_auc)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# Named segment from quintile scores: evaluated top-down, identical
# CASE in both engines.
_SEGMENT_CASE = """
    CASE
      WHEN r >= 4 AND f >= 4 THEN 'loyal_recent'
      WHEN r >= 4 THEN 'recent'
      WHEN r <= 2 AND m >= 4 THEN 'at_risk_big_spender'
      WHEN r <= 2 THEN 'lapsed'
      ELSE 'core'
    END
"""


@register(
    "ext_rfm_segmentation",
    f"""
    WITH base AS (
      SELECT o_custkey AS custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             sum({_CENTS.format(col="o_totalprice")}) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey,
             ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS r,
             ntile(5) OVER (ORDER BY frequency ASC, custkey) AS f,
             ntile(5) OVER (ORDER BY monetary_cents ASC, custkey) AS m,
             monetary_cents
      FROM base
    )
    SELECT {_SEGMENT_CASE} AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS monetary_cents,
           CAST(sum(monetary_cents) AS DOUBLE) / count(*) AS avg_monetary_cents
    FROM scored
    GROUP BY 1 ORDER BY segment
    """,
)
def ext_rfm_segmentation(spark, sf_dir):
    """RFM (Recency/Frequency/Monetary) segmentation — the canonical
    warehouse customer-value rollup. Quintile scores come from
    `ntile(5)` under a TOTAL order (metric, custkey tiebreak), so the
    bucketing is deterministic cross-engine (both implement standard
    SQL ntile: earlier buckets absorb the remainder). Monetary is
    exact half-up cents. Scale: one groupBy(custkey) shuffle, then
    three window passes over the customer-grain table (1/40 of
    orders) — the ntile total sort is the only global order, and it
    runs on the aggregated grain, never on raw orders. At 100 TB the
    customer grain is still ~1e9 rows; ntile's single-partition sort
    would bottleneck, so the production path would swap ntile for a
    percentile-bucketed score (approx quantile boundaries broadcast
    back) — noted here, exact ntile kept for oracle parity.
    Reference analog: none (extends ext_cohort_retention family)."""
    orders = _t(spark, sf_dir, "orders")
    maxd = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("gmax"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("lastd"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.expr(_CENTS.format(col="o_totalprice"))).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff(F.col("gmax"), F.col("lastd")).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    scored = base.select(
        "custkey",
        "monetary_cents",
        F.ntile(5).over(Window.orderBy(F.desc("recency_days"), F.asc("custkey"))).alias("r"),
        F.ntile(5).over(Window.orderBy(F.asc("frequency"), F.asc("custkey"))).alias("f"),
        F.ntile(5).over(Window.orderBy(F.asc("monetary_cents"), F.asc("custkey"))).alias("m"),
    )
    return (
        scored.groupBy(F.expr(_SEGMENT_CASE).alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("monetary_cents"),
            (F.sum("monetary_cents").cast("double") / F.count(F.lit(1))).alias(
                "avg_monetary_cents"
            ),
        )
        .orderBy("segment")
    )


@register(
    "ext_abc_classification",
    f"""
    WITH rev AS (
      SELECT l_partkey AS partkey,
             sum({_CENTS.format(col="l_extendedprice * (1 - l_discount)")})
               AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ),
    cum AS (
      SELECT partkey, rev_cents,
             sum(rev_cents) OVER (ORDER BY rev_cents DESC, partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
             (SELECT sum(rev_cents) FROM rev) AS total_cents
      FROM rev
    )
    SELECT CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
                WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS class_cents,
           CAST(sum(rev_cents) AS DOUBLE)
             / (SELECT CAST(total_cents AS DOUBLE) FROM cum LIMIT 1)
             AS revenue_share
    FROM cum GROUP BY 1 ORDER BY abc_class
    """,
)
def ext_abc_classification(spark, sf_dir):
    """ABC (Pareto 80/95) inventory classification by cumulative
    revenue share. Per-part revenue reduces to exact half-up cents at
    the row; the cumulative sum runs under a TOTAL order
    (rev DESC, partkey) in exact BIGINT; class boundaries are integer
    cross-multiplications (cum*5 <= total*4 is cum/total <= 0.80 with
    no float), so the A/B/C split is bit-exact at any SF. Scale: one
    groupBy(partkey) shuffle collapses lineitem to the part grain
    (200× smaller); the running sum is a single-partition window over
    that grain — at 100 TB you'd range-partition by rev_cents and
    broadcast per-range offsets (the llm_pack_sequences distributed
    prefix-sum pattern), noted in-line. Reference analog: none
    (extends ext_topn_other / ml_gini_lorenz family)."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.expr(_CENTS.format(col="l_extendedprice * (1 - l_discount)"))
            ).alias("rev_cents")
        )
    )
    total = rev.agg(F.sum("rev_cents").alias("total_cents"))
    w = (
        Window.orderBy(F.desc("rev_cents"), F.asc("partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("rev_cents").over(w)).crossJoin(
        F.broadcast(total)
    )
    cls = F.when(F.col("cum_cents") * 5 <= F.col("total_cents") * 4, "A").otherwise(
        F.when(F.col("cum_cents") * 20 <= F.col("total_cents") * 19, "B").otherwise("C")
    )
    return (
        cum.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev_cents").cast("long").alias("class_cents"),
            (
                F.sum("rev_cents").cast("double")
                / F.max(F.col("total_cents").cast("double"))
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "ml_anova_oneway",
    f"""
    WITH g AS (
      SELECT c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CENTS.format(col="c_acctbal")}) AS DECIMAL(38,0)) AS s,
             CAST(sum(CAST({_CENTS.format(col="c_acctbal")} AS DECIMAL(38,0))
                      * {_CENTS.format(col="c_acctbal")}) AS DECIMAL(38,0)) AS ss
      FROM customer GROUP BY c_mktsegment
    ),
    fold AS (
      SELECT seg,
             sum(CAST(s * s AS DOUBLE) / n) OVER (ORDER BY seg
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS term_sum,
             row_number() OVER (ORDER BY seg) AS rn
      FROM g
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n_total,
             CAST(sum(s) AS DECIMAL(38,0)) AS s_total,
             CAST(sum(ss) AS DECIMAL(38,0)) AS ss_total
      FROM g
    )
    SELECT k, n_total,
           term_sum - CAST(s_total * s_total AS DOUBLE) / n_total AS ss_between,
           CAST(ss_total AS DOUBLE) - term_sum AS ss_within,
           ((term_sum - CAST(s_total * s_total AS DOUBLE) / n_total) / (k - 1))
             / ((CAST(ss_total AS DOUBLE) - term_sum) / (n_total - k)) AS f_stat
    FROM fold, tot
    WHERE rn = k
    """,
)
def ml_anova_oneway(spark, sf_dir):
    """One-way ANOVA F-test of account balance (half-up cents) across
    the 5 market segments. The data-volume pass produces exact
    integers only: per-segment n, sum(cents) and sum(cents^2), both
    sums in DECIMAL(38,0) (cents^2 ~1e12/row never overflows at any
    SF). The between-group term sum_g(s_g^2/n_g) needs a float sum
    over the 5 groups, so it rides the sequential-fold doctrine: a
    running window sum in segment order — the identical op tree both
    engines (proven by ml_average_precision / ml_cramers_v). F =
    (SSB/(k-1)) / (SSW/(N-k)) is then one fixed IEEE formula, shipped
    unrounded. Scale: one partial-aggregable groupBy to 5 rows; the
    fold is a 5-row window. Reference analog: none (extends
    ml_welch_ttest to k groups)."""
    cents = F.expr(_CENTS.format(col="c_acctbal"))
    g = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("decimal(38,0)").alias("s"),
            F.sum(cents.cast("decimal(38,0)") * cents).cast("decimal(38,0)").alias("ss"),
        )
    )
    w = Window.orderBy("seg").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fold = g.select(
        "seg",
        F.sum((F.col("s") * F.col("s")).cast("double") / F.col("n")).over(w).alias("term_sum"),
        F.row_number().over(Window.orderBy("seg")).alias("rn"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("decimal(38,0)").alias("s_total"),
        F.sum("ss").cast("decimal(38,0)").alias("ss_total"),
    )
    j = fold.crossJoin(F.broadcast(tot)).where(F.col("rn") == F.col("k"))
    ssb = F.col("term_sum") - (F.col("s_total") * F.col("s_total")).cast("double") / F.col(
        "n_total"
    )
    ssw = F.col("ss_total").cast("double") - F.col("term_sum")
    return j.select(
        "k",
        "n_total",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        ((ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k")))).alias(
            "f_stat"
        ),
    )


@register(
    "ml_matthews_corrcoef",
    f"""
    WITH c AS (
      SELECT
        CAST(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN NOT pred AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(sum(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM (
        SELECT {_CENTS.format(col="o_totalprice")} > 25000000 AS pred,
               o_orderpriority IN ('1-URGENT', '2-HIGH') AS truth
        FROM orders
      )
    )
    SELECT tp, fp, tn, fn,
           CAST(CAST(tp AS DECIMAL(38,0)) * tn
                - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
             / sqrt(CAST(CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn) AS DOUBLE)
                    * CAST(CAST(tn + fp AS DECIMAL(38,0)) * (tn + fn) AS DOUBLE))
             AS mcc
    FROM c
    """,
)
def ml_matthews_corrcoef(spark, sf_dir):
    """Matthews correlation coefficient for the fixed price-threshold
    (cents > 25_000_000) urgent-order classifier — the
    balanced-accuracy companion to ml_confusion_matrix / ml_roc_auc.
    Confusion counts are exact integers from one partial-aggregable
    scan. Exactness of the formula: tp*tn - fp*fn and the two
    pairwise sums products live in DECIMAL(38,0) (counts ~1e12 at
    100 TB -> products ~1e24, inside 38 digits), each cast to DOUBLE
    once (nearest-even, identical both engines), multiplied in a
    pinned order, one sqrt, one division — a single IEEE tree,
    shipped unrounded. Scale: one scan, 4-cell aggregate. Reference
    analog: none (extends ml_confusion_matrix)."""
    o = _t(spark, sf_dir, "orders").select(
        (F.expr(_CENTS.format(col="o_totalprice")) > 25000000).alias("pred"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("truth"),
    )
    c = o.agg(
        F.sum(F.when(F.col("pred") & F.col("truth"), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("truth"), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~F.col("pred") & ~F.col("truth"), 1).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when(~F.col("pred") & F.col("truth"), 1).otherwise(0)).cast("long").alias("fn"),
    )
    num = (
        F.col("tp").cast("decimal(38,0)") * F.col("tn")
        - F.col("fp").cast("decimal(38,0)") * F.col("fn")
    ).cast("double")
    den = F.sqrt(
        ((F.col("tp") + F.col("fp")).cast("decimal(38,0)") * (F.col("tp") + F.col("fn"))).cast(
            "double"
        )
        * ((F.col("tn") + F.col("fp")).cast("decimal(38,0)") * (F.col("tn") + F.col("fn"))).cast(
            "double"
        )
    )
    return c.select("tp", "fp", "tn", "fn", (num / den).alias("mcc"))


@register(
    "ml_brier_score",
    f"""
    WITH s AS (
      SELECT least(9999, {_CENTS.format(col="o_totalprice")} // 5000) AS p_e4,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 10000 ELSE 0 END AS y_e4
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST((p_e4 - y_e4) AS DECIMAL(38,0)) * (p_e4 - y_e4))
                AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 100000000.0) AS brier
    FROM s
    """,
)
def ml_brier_score(spark, sf_dir):
    """Brier score (mean squared probability error) for the
    deterministic e4-grid price score p = min(cents/5000, 9999)/1e4
    predicting order urgency — the probability-calibration companion
    to ml_calibration_bins. Everything that touches data volume is an
    exact integer: p and y live on the e4 grid, per-row squared
    errors are exact e8 BIGINTs summed in DECIMAL(38,0) (1e8/row at
    1e12 rows -> 1e20, inside 38 digits); the score is ONE division
    by n*1e8 at the end. Truncating integer division: Spark DIV and
    DuckDB // both truncate toward zero (positive operands here).
    Scale: one scan, 2-cell aggregate. Reference analog: none
    (extends ml_calibration_bins)."""
    s = _t(spark, sf_dir, "orders").select(
        F.least(
            F.lit(9999), F.expr(_CENTS.format(col="o_totalprice") + " DIV 5000")
        ).alias("p_e4"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 10000)
        .otherwise(0)
        .alias("y_e4"),
    )
    d = F.col("p_e4") - F.col("y_e4")
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(d.cast("decimal(38,0)") * d).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(100000000.0))
        ).alias("brier"),
    )
