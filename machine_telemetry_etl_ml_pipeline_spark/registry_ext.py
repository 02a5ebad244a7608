"""§2B extension query surface (SURVEY.md §2B): joins, set ops,
grouping sets, window functions, percentiles, scalar functions,
batch time-windows — over the TPC-H-ish testdata.

The reference implements NONE of these (no JOIN appears anywhere in
/root/reference/project/db.py — SURVEY §2A end-note); they are the
north-star "full query capabilities" mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.joins import anti_join, asof_join, semi_join
from .operators.windows import lag_lead, ranked, running, sessionized
from .registry import _epoch, _t, register


# --- joins ---------------------------------------------------------------


@register(
    "ext_join_revenue_by_nation",
    """
    SELECT r_name, n_name, count(*) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def ext_join_revenue_by_nation(spark, sf_dir):
    """Fact->dim join chain with broadcast dims (TPC-H Q5 shape).
    nation/region are always-small -> explicit broadcast; orders is a
    fact-fact sort-merge join left to AQE. customer is broadcast at
    test SF but would exceed the threshold at 100 TB — left to AQE's
    runtime decision rather than forced. Revenue folds as an exact
    per-row-cents BIGINT sum (the tpch_q19 lesson, resurfaced by the
    full-registry 10x sweep: round(sum(double), 4) at ~1e10 group
    sums puts partial-sum order error above the 4dp grid)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # floor(x + 0.5), not round(): Spark's round() on double detours
    # through BigDecimal per row (~40% slower here); floor stays in
    # codegen and both engines floor identically on positive cents
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum(cents).cast("double") / 100).alias("revenue"),
    )


@register(
    "ext_join_left_order_counts",
    """
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 4) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def ext_join_left_order_counts(spark, sf_dir):
    """LEFT outer join preserving customers with zero orders;
    count(col) counts non-null matches only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spent"),
        )
    )


@register(
    "ext_join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def ext_join_semi(spark, sf_dir):
    """LEFT SEMI join — only join keys of the right side ship."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return semi_join(c, big, c.c_custkey == big.o_custkey).select("c_custkey", "c_name")


@register(
    "ext_join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def ext_join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return anti_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@register(
    "ext_join_theta",
    """
    SELECT p_brand, count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  AND l_extendedprice > p_retailprice
    GROUP BY p_brand
    """,
)
def ext_join_theta(spark, sf_dir):
    """Equi + theta composite condition: the equi key drives the hash
    join, the inequality is a post-join residual filter (no nested-loop
    explosion). The price rollup is an exact per-row-cents BIGINT sum:
    round(sum(float), 4) diverged at the 10x replica once the group
    sums reached ~1e10 (partial-sum order error above the 4dp grid) —
    the same class the r5 differential caught in tpch_q19."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(
        p, (li.l_partkey == p.p_partkey) & (li.l_extendedprice > p.p_retailprice)
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("sum_price_cents"),
    )


@register(
    "ext_asof_join",
    f"""
    SELECT p.event_id, p.user_id, CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_epoch,
           p.value,
           first(v.event_id ORDER BY v.ts DESC, v.event_id) AS asof_event_id,
           first(v.value ORDER BY v.ts DESC, v.event_id) AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    GROUP BY p.event_id, p.user_id, p.ts, p.value
    """,
)
def ext_asof_join(spark, sf_dir):
    """As-of join: for each purchase, the user's latest view at-or-before
    it. Union+window formulation (operators/joins.py): ONE shuffle on
    user_id, linear in rows — vs. the naive equi+theta join which is
    quadratic per key. event_id pins the pick among exact (user_id, ts)
    ties on both engines (smallest wins): DuckDB's native ASOF reads
    better as an oracle but has no tiebreak syntax, and the forward
    variant's 10x differential red proved tied data then diverges."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    out = asof_join(
        purchases, views, "user_id", "ts", "ts", ["event_id", "value"],
        right_tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", _epoch().alias("ts_epoch"), "value",
        "asof_event_id", "asof_value",
    )


# --- set operations ------------------------------------------------------


@register(
    "ext_union_all",
    """
    SELECT event_id, event_type, value FROM events WHERE value > 190
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
    """,
)
def ext_union_all(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.filter(F.col("value") > 190).unionByName(e.filter(F.col("event_type") == "error"))


@register(
    "ext_union_distinct",
    """
    SELECT event_id, event_type, value FROM events WHERE value > 190
    UNION
    SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
    """,
)
def ext_union_distinct(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return (
        e.filter(F.col("value") > 190)
        .unionByName(e.filter(F.col("event_type") == "error"))
        .distinct()
    )


@register(
    "ext_intersect",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def ext_intersect(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "ext_except",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def ext_except(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    # subtract == EXCEPT DISTINCT (set semantics); exceptAll would be
    # multiset difference and leave users whose purchase-count exceeds
    # their error-count — not what SQL EXCEPT means.
    return a.subtract(b)


# --- grouping sets -------------------------------------------------------


@register(
    "ext_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def ext_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty")
    )


@register(
    "ext_cube",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def ext_cube(spark, sf_dir):
    """CUBE over order status x priority. The grand-total cell sums
    the entire fact table's price mass, so it folds as exact integer
    cents in DECIMAL(38,0) (oracle_audit: 3.75e10 at 10x leaves <64
    ULPs to a 4dp rounding grid — the tpch_q19 class)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents.cast("decimal(38,0)")).cast("double") / 100).alias("sum_price"),
    )


# --- window functions ----------------------------------------------------


@register(
    "ext_window_rank",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS row_num,
           rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS dense_rnk
    FROM customer
    """,
)
def ext_window_rank(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return ranked(c, "c_mktsegment", "c_acctbal", descending=True, tiebreak="c_custkey").select(
        "c_custkey", "c_mktsegment", "c_acctbal", "row_num", "rnk", "dense_rnk"
    )


@register(
    "ext_window_lag_lead",
    """
    SELECT event_id, user_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v
    FROM events
    """,
)
def ext_window_lag_lead(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return lag_lead(e, "user_id", "ts", "value", tiebreak="event_id").select(
        "event_id", "user_id", "value", "prev_v", "next_v"
    )


@register(
    "ext_window_running",
    """
    SELECT event_id, user_id,
           CAST(sum(cents) OVER w AS BIGINT) / 100.0 AS running_sum,
           CAST(CASE WHEN sum(cents) OVER w >= 0
                     THEN (sum(cents) OVER w * 100) // count(*) OVER w
                     ELSE -((-(sum(cents) OVER w * 100)) // count(*) OVER w)
                END AS BIGINT) AS running_avg_e4
    FROM (SELECT event_id, user_id, ts,
                 CAST(round(value * 100) AS BIGINT) AS cents FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
    """,
)
def ext_window_running(spark, sf_dir):
    """Running sum/avg with an explicit rows frame. Oracle-parity note:
    the accumulation runs on exact integer cents (values have 2
    decimals), and the average is emitted in truncated 1e-4 units —
    small-n averages land exactly on round-half boundaries where Spark
    (BigDecimal shortest-repr HALF_UP) and DuckDB (binary rounding)
    legitimately disagree."""
    e = _t(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    out = running(e, "user_id", "ts", "cents", tiebreak="event_id")
    return out.select(
        "event_id",
        "user_id",
        (F.col("running_sum") / 100.0).alias("running_sum"),
        F.expr("(running_sum * 100) div __cnt").alias("running_avg_e4"),
    )


# --- aggregation extensions ----------------------------------------------


@register(
    "ext_percentiles",
    """
    SELECT round(quantile_cont(l_quantity::DOUBLE, 0.5), 4) AS median_qty,
           round(quantile_cont(l_quantity::DOUBLE, 0.9), 4) AS p90_qty,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_extendedprice), 4) AS var_price
    FROM lineitem
    """,
)
def ext_percentiles(spark, sf_dir):
    """Exact percentiles (interpolating, = quantile_cont). The 100 TB
    path is percentile_approx (t-digest, partial-aggregable); exact
    percentile is a full sort per group and exists for parity."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_extendedprice"), 4).alias("var_price"),
    )


@register(
    "ext_max_by",
    """
    SELECT user_id,
           arg_max(event_type, CAST(round(value * 100) AS BIGINT) * 1099511627776
                               + event_id) AS top_type,
           round(max(value), 4) AS max_value,
           arg_min(event_type, CAST(round(value * 100) AS BIGINT) * 1099511627776
                               + event_id) AS bottom_type
    FROM events GROUP BY user_id
    """,
)
def ext_max_by(spark, sf_dir):
    """max_by/min_by (argmax). Equal values within a group make plain
    max_by nondeterministic, so the ordering key is a composite
    (cents << 40) + event_id scalar — deterministic in both engines
    (DuckDB arg_max has no struct-key overload)."""
    e = _t(spark, sf_dir, "events")
    key = F.round(F.col("value") * 100).cast("long") * F.lit(1099511627776).cast("long") + F.col(
        "event_id"
    )
    return e.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("top_type"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.min_by("event_type", key).alias("bottom_type"),
    )


@register(
    "ext_approx_count_distinct",
    """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
           true AS users_within_5pct,
           true AS events_within_5pct
    FROM events
    """,
)
def ext_approx_count_distinct(spark, sf_dir):
    """HLL approximate distinct — the 100 TB replacement for exact
    COUNT(DISTINCT) (reference db.py:230). HLL estimates are
    engine-specific by construction, so the estimate itself cannot be
    hash-compared — instead the entry runs BOTH the sketch and the
    exact count in one aggregate and emits the exact counts plus an
    error-bound verdict (|approx-exact|/exact <= 5%, five sigma at
    rsd=0.01): the sketch stays the surface under test, and the
    oracle now checks a real cross-engine invariant instead of the
    r2-r7 rows-only row count. Upgraded per the r7 verdict item 5.

    Shape (r11): one aggregate per distinct column, combined via the
    repo's 1-row-panel crossJoin, NOT one agg with two COUNT(DISTINCT)
    columns. The multi-distinct form plans an Expand (3x the fact rows,
    (gid, user_id, event_id)-wide partial-agg keys) at scan-partition
    granularity — at the 100x replica that shape OOM'd the executor
    (TungstenAggregate spill-reader heap death); per-column aggregates
    keep the partial key narrow, skip Expand entirely, and each scan
    prunes to a single parquet column, which is also the cheaper plan
    at 100 TB (two 1-column scans < one 3x-expanded shuffle)."""
    e = _t(spark, sf_dir, "events")
    users = e.agg(
        F.countDistinct("user_id").alias("eu"),
        F.approx_count_distinct("user_id", 0.01).alias("au"),
    )
    events = e.agg(
        F.countDistinct("event_id").alias("ee"),
        F.approx_count_distinct("event_id", 0.01).alias("ae"),
    )
    return users.crossJoin(events).select(
        F.col("eu").cast("long").alias("exact_users"),
        F.col("ee").cast("long").alias("exact_events"),
        (
            F.abs(F.col("au") - F.col("eu")) / F.col("eu").cast("double") <= 0.05
        ).alias("users_within_5pct"),
        (
            F.abs(F.col("ae") - F.col("ee")) / F.col("ee").cast("double") <= 0.05
        ).alias("events_within_5pct"),
    )


# --- scalar function surface ----------------------------------------------


@register(
    "ext_scalar_string",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 10, 4) AS name_mid,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           c_name || '/' || c_mktsegment AS name_seg,
           trim('  ' || c_mktsegment || ' ') AS seg_trim,
           length(c_name) AS name_len,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           split_part(c_name, '#', 2) AS name_num
    FROM customer
    """,
)
def ext_scalar_string(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 4).alias("name_mid"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


@register(
    "ext_scalar_date",
    """
    SELECT o_orderkey,
           CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_start_epoch,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
           CAST(o_orderdate AS DATE) AS odate
    FROM orders
    """,
)
def ext_scalar_date(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.unix_timestamp(F.date_trunc("month", "o_orderdate")).cast("long").alias("month_start_epoch"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus3m"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )


@register(
    "ext_scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_quantity * l_extendedprice, 2) AS qty_price,
           round(abs(l_discount - 0.05), 4) AS disc_dev,
           round(ln(l_extendedprice), 4) AS ln_price,
           round(pow(l_quantity, 2), 4) AS qty_sq,
           round(sqrt(l_extendedprice), 4) AS sqrt_price,
           CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct_floor,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    """,
)
def ext_scalar_math(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias("qty_price"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("ln_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_price"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct_floor"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
    )


@register(
    "ext_explode_wordcount",
    """
    SELECT word, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
    """,
)
def ext_explode_wordcount(spark, sf_dir):
    """split -> explode -> filter -> agg -> top-k (array surface)."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@register(
    "ext_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def ext_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


# --- batch time-window aggregation (streaming twins in streaming/) --------


@register(
    "ext_tumbling_window",
    f"""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts))) AS BIGINT) AS window_start,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
)
def ext_tumbling_window(spark, sf_dir):
    """Tumbling 1h aggregate — batch twin of
    streaming/windows.tumbling_counts (same window() primitive)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("__w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("__w.start")).cast("long").alias("window_start"), "n", "sum_value"
        )
    )


@register(
    "ext_sliding_window",
    """
    SELECT CAST(floor(epoch(ws)) AS BIGINT) AS window_start,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM (
      SELECT value,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      FROM events
    )
    GROUP BY ws
    """,
)
def ext_sliding_window(spark, sf_dir):
    """Sliding window 1h/30m: each event lands in 2 overlapping windows
    (window() emits one row per bucket). DuckDB oracle enumerates the
    same 2 bucket starts per event."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("__w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("__w.start")).cast("long").alias("window_start"), "n", "sum_value"
        )
    )


@register(
    "ext_session_windows",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(floor(epoch(max(ts))) AS BIGINT)
             - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
    FROM sess GROUP BY user_id, session_id
    """,
)
def ext_session_windows(spark, sf_dir):
    """Session windows (30 min gap) via gaps-and-islands — the batch
    analog of streaming session_window(); one shuffle + one sort."""
    e = _t(spark, sf_dir, "events")
    s = sessionized(e, "user_id", "ts", 1800, tiebreak="event_id")
    return s.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")).cast("long")
            - F.unix_timestamp(F.min("ts")).cast("long")
        ).alias("duration_sec"),
    )
