"""Second extension batch: write-path/sink operators (SURVEY §2A rows
4,7-9; digest-oracle-checked since round 2), pivot/unpivot, GROUPING
SETS, SQL subqueries (scalar + correlated), extra window functions,
array/map/regexp/date-format surface, TPC-H classic shapes
(Q1/Q3/Q4/Q6/Q14), an oracle-checked Structured Streaming query, and
MLlib StringIndexer parity.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from .registry import _epoch, _t, register
from .sources.catalog import load_table


def _views(spark, sf_dir, *names):
    """Register testdata tables as temp views for spark.sql entry
    (EP2: the SQL-string lifecycle the reference delegates to Postgres,
    SURVEY §3)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# --- write-path / sink operators ------------------------------------------
# Oracle-checked (round-2 upgrade): each sink writes a payload derived
# deterministically from a source table, reads it back, and emits digest
# aggregates; the DuckDB oracle computes the SAME digests straight from
# the source view. No file dependency in the oracle (robust to driver
# run order), but a corrupted/partial write-read round trip changes the
# Spark-side digest and fails the hash.


@register(
    "ref_sink_batch_insert",
    """
    SELECT count(*) AS after_first,
           2 * count(*) AS after_second,
           2 * CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           2 * CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    """,
)
def ref_sink_batch_insert(spark, sf_dir):
    """Batch append sink — the reference's execute_values page_size=1000
    + commit (database_and_model_tools.py:75-97). Two appends of the
    same deterministic events projection into a fresh parquet table
    (distributed write, one atomic commit per batch); the result is the
    read-back count after each commit plus read-back content digests,
    which the oracle recomputes from the logical source."""
    path = tempfile.mkdtemp(prefix="sink_batch_") + "/t"
    src = _t(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    after_first = None
    for i in range(2):
        src.write.mode("append").parquet(path)
        if i == 0:
            after_first = spark.read.parquet(path).count()
    back = spark.read.parquet(path)
    return back.agg(
        F.lit(after_first).cast("long").alias("after_first"),
        F.count(F.lit(1)).alias("after_second"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum("cents").alias("sum_cents"),
    )


@register(
    "ref_sink_insert_defaults",
    """
    SELECT * FROM (VALUES
      ('operator', 'regression', 0.9::DOUBLE, true),
      ('manager',  'anomaly',    0.0::DOUBLE, true)
    ) t(role, intent, confidence, has_ts)
    """,
)
def ref_sink_insert_defaults(spark, sf_dir):
    """Insert with default-valued columns + None->0.0 coercion — the
    reference's log_user_query (project/db.py:163-169): ts_epoch is
    stamped at write time, NULL confidence coalesced to 0.0. The
    write-time default semantics (coalesce applied, timestamp present)
    are read back from the parquet commit and checked against the
    literal expected rows."""
    path = tempfile.mkdtemp(prefix="sink_defaults_") + "/t"
    rows = spark.createDataFrame(
        [("operator", "q1", "regression", 0.9), ("manager", "q2", "anomaly", None)],
        "role string, query string, intent string, confidence double",
    )
    stamped = rows.withColumn("confidence", F.coalesce("confidence", F.lit(0.0))).withColumn(
        "ts_epoch", F.unix_timestamp(F.current_timestamp()).cast("long")
    )
    stamped.write.mode("append").parquet(path)
    back = spark.read.parquet(path)
    return back.select(
        "role", "intent", "confidence", F.col("ts_epoch").isNotNull().alias("has_ts")
    )


@register(
    "ref_sink_insert_json",
    """
    SELECT 'M001' AS machine_id, 'regression' AS intent,
           82.5::DOUBLE AS numerical_answer,
           'fuelconsumption' AS first_key, 2 AS n_features
    """,
)
def ref_sink_insert_json(spark, sf_dir):
    """JSON-serialized feature insert — the reference's log_prediction
    (project/db.py:171-185): map -> to_json at write, from_json on
    read-back (JSONB parity via MapType, SURVEY §1.2). first_key uses
    array_sort for a deterministic map-key order."""
    path = tempfile.mkdtemp(prefix="sink_json_") + "/t"
    rows = spark.createDataFrame(
        [("M001", "regression", 82.5, {"fuelconsumption": 10.5, "humidity": 68.0})],
        "machine_id string, intent string, numerical_answer double, features map<string,double>",
    )
    rows.withColumn("features_json", F.to_json("features")).drop("features").write.mode(
        "append"
    ).parquet(path)
    back = spark.read.parquet(path).withColumn(
        "features", F.from_json("features_json", "map<string,double>")
    )
    return back.select(
        "machine_id",
        "intent",
        "numerical_answer",
        F.array_sort(F.map_keys("features"))[0].alias("first_key"),
        F.size(F.map_keys("features")).alias("n_features"),
    )


# --- pivot / unpivot --------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "ext_pivot",
    f"""
    SELECT user_id,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def ext_pivot(spark, sf_dir):
    """Pivot (wide aggregation): explicit value list so the plan is a
    single pass (no extra distinct-values job) — at scale an un-listed
    pivot scans twice."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count().na.fill(0)


@register(
    "ext_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def ext_unpivot(spark, sf_dir):
    """Unpivot/melt: wide -> long."""
    li = _t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


@register(
    "ext_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def ext_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping_id disambiguation (SQL
    entry point — the DataFrame API only exposes cube/rollup). The
    () grand-total sum is one group over the whole fact table, so the
    price mass folds as exact integer cents in DECIMAL(38,0)
    (oracle_audit: 3.2e10 at 10x leaves <64 ULPs to a 4dp grid)."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id() AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                             AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --- subqueries --------------------------------------------------------------


@register(
    "ext_scalar_subquery",
    """
    SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def ext_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery in a predicate (Catalyst rewrites
    to a broadcast join against the 1-row aggregate)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "ext_correlated_subquery",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) * 1.5 FROM customer c2
                       WHERE c2.c_mktsegment = c.c_mktsegment)
    """,
)
def ext_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (the reference's Postgres planner did this for
    free; Spark's subquery decorrelation is the same rewrite)."""
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) * 1.5 FROM customer c2
                           WHERE c2.c_mktsegment = c.c_mktsegment)
        """
    )


# --- window extras ------------------------------------------------------------


@register(
    "ext_window_distribution",
    """
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def ext_window_distribution(spark, sf_dir):
    """ntile / percent_rank / cume_dist, PARTITIONED by market segment
    (round-2: the r1 version used a global un-partitioned window — a
    single-reducer sort that SCALE.md had to flag as a trade-off;
    per-segment distribution ranks are both the realistic analytics
    shape and shuffle-parallel). Unique total order via the custkey
    tiebreak so every engine agrees."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "ext_window_first_last",
    """
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS last_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def ext_window_first_last(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
    )


@register(
    "ext_window_range_frame",
    """
    SELECT o_orderkey, cnt_within_10k FROM (
      SELECT o_orderkey,
             count(*) OVER (ORDER BY o_totalprice
                            RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
               AS cnt_within_10k
      FROM orders
    )
    """,
)
def ext_window_range_frame(spark, sf_dir):
    """Numeric RANGE frame (value-based, not row-based): how many
    orders fall within 10k below each order's price."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc()).rangeBetween(-10000, 0)
    return o.select("o_orderkey", F.count(F.lit(1)).over(w).alias("cnt_within_10k"))


# --- array / map / regexp / date-format surface -------------------------------


@register(
    "ext_array_functions",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_dim,
           round(CAST(list_max(embedding) AS DOUBLE), 4) + 0 AS max_dim,
           round(CAST(list_min(embedding) AS DOUBLE), 4) + 0 AS min_dim,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) + 0 AS sum_dims,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def ext_array_functions(spark, sf_dir):
    """Array surface: size/element_at/max/min + lambda transform,
    aggregate, filter (all JVM-side higher-order functions). Every
    rounded float carries the registry's `+ 0` IEEE -0.0 normalizer:
    a first dim in (-5e-5, 0) rounded to -0.0 on one engine and 0.0
    on the other — found by the r5 10x differential, whose larger
    sample hit the band sf0.01 happened to miss."""
    e = _t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    zero = F.lit(0.0)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + zero).alias("first_dim"),
        (F.round(F.array_max("embedding").cast("double"), 4) + zero).alias("max_dim"),
        (F.round(F.array_min("embedding").cast("double"), 4) + zero).alias("min_dim"),
        (F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 4) + zero).alias("sum_dims"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "ext_map_functions",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           len(json_keys(props)) AS n_keys,
           json_keys(props)[1] AS first_key
    FROM events
    """,
)
def ext_map_functions(spark, sf_dir):
    """JSON -> map -> key introspection (from_json / map_keys)."""
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@register(
    "ext_regexp_functions",
    """
    SELECT p_partkey, p_name,
           regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           len(regexp_extract_all(p_name, '[a-z]+')) AS n_words
    FROM part
    """,
)
def ext_regexp_functions(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)).alias("n_words"),
    )


@register(
    "ext_date_format",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H') AS fmt,
           strftime(o_orderdate, '%Y/%m') AS ym
    FROM orders
    """,
)
def ext_date_format(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH").alias("fmt"),
        F.date_format("o_orderdate", "yyyy/MM").alias("ym"),
    )


# --- TPC-H classic shapes ------------------------------------------------------


@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 AS sum_base_price,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                    * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
                AS DOUBLE) / 1000000 AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary (the canonical partial-agg benchmark:
    map-side combine reduces 600k rows to 6 groups before the shuffle).
    The three money sums fold as exact integer cents/e4/e6 units (the
    tpch_q19 class, flagged proactively by tools/oracle_audit.py:
    round(sum(double), 4) at ~4e10 group sums leaves <64 ULPs of slack
    to the 4dp grid at 10x); the single integer->double conversion +
    division at the end is deterministic on both engines.

    Fold-width choice (r7 isolated re-measure, SCALE.md "tpch_q1
    re-measure"): decimal38-all 123ms vs hybrid 75ms on the cached agg
    at sf0.1, so each fold rides the cheapest exact width its 100 TB
    headroom allows. 100 TB ~ TPC-H SF 1e5 -> 6e11 lineitem rows,
    ~1.5e11 per (returnflag, linestatus) group:
    - cents <= 1.1e7/row -> group sum <= 1.65e18 < 2^63-1 = 9.2e18
      (5.6x headroom) -> BIGINT fold for sum_base_price.
    - e4 units <= 1.1e9/row -> 1.65e20 overflows BIGINT -> disc_price
      stays DECIMAL(38,0).
    - e6 units <= 1.21e11/row -> 1.8e22 -> charge stays DECIMAL(38,0).
    sum_qty/avg_* stay double: quantity is integer-valued (exact in
    double to 2^53) and the avg quotients are ~1e4 magnitude, far
    from the grid."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dc = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    tc = F.floor(F.col("l_tax") * 100 + 0.5).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            (F.sum(cents).cast("double") / 100).alias("sum_base_price"),
            (F.sum((cents * (100 - dc)).cast(dec)).cast("double") / 10000).alias(
                "sum_disc_price"
            ),
            (
                F.sum((cents * (100 - dc) * (100 + tc)).cast(dec)).cast("double")
                / 1000000
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'MACHINERY'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping-priority shape (selective dim filter ->
    join -> agg -> top-k)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    joined = c.join(o, c.c_custkey == o.o_custkey).join(li, o.o_orderkey == li.l_orderkey)
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").cast("long").alias("o_orderdate_epoch"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q6",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecast-revenue (pure scan+filter+agg: every predicate
    pushes into the parquet scan). Money math rides integer units
    (r11): `round(sum(price * discount), 4)` on raw doubles is
    order-divergent — the r11 100x probe caught Spark and DuckDB one
    4dp grid step apart (…598.91 vs …598.9099) summing ~8.5M products
    into ONE row, the documented round(double,4) channel surfacing
    only at that accumulation depth (1x/10x/30x all hashed equal).
    Armor = the repo's integer-cents doctrine: price->cents and
    discount->integer percent are each exact (2dp decimals), their
    product is an exact BIGINT in 1e-4-dollar units, the sum
    accumulates order-insensitively in DECIMAL(38,0) (ANSI-safe; DuckDB
    promotes to HUGEINT), and the one display division of an exactly-
    representable <2^53 integer by 10000.0 is the same IEEE op on both
    engines — no round() anywhere, bitwise-equal at every SF."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            (F.sum((cents * pct).cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 order-priority shape: correlated EXISTS over the fact
    table — planned as a left-semi join, shuffling only join keys."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "tpch_q14",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion-share shape: conditional aggregation over a
    fact-dim join (part broadcast at this SF via AQE)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias("promo_revenue_pct"))
    )


# --- streaming (oracle-checked through the memory sink) -----------------------


@register(
    "stream_tumbling_counts",
    f"""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts))) AS BIGINT) AS window_start,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
)
def stream_tumbling_counts(spark, sf_dir):
    """Structured Streaming tumbling window, drained with an
    availableNow memory sink and returned as a batch DataFrame — the
    ORACLE is the plain batch SQL, proving the streaming event-time
    semantics equal the batch semantics over the same input."""
    import uuid

    from .session import tune_session
    from .streaming.windows import events_testdata_stream

    tune_session(spark)
    stream = events_testdata_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "n",
            "sum_value",
        )
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- MLlib parity --------------------------------------------------------------


@register(
    "ml_string_indexer",
    """
    SELECT event_type,
           CAST(row_number() OVER (ORDER BY count(*) DESC, event_type ASC) - 1
                AS DOUBLE) AS type_index
    FROM events GROUP BY event_type
    """,
)
def ml_string_indexer(spark, sf_dir):
    """MLlib StringIndexer parity: frequencyDesc ordering with
    alphabetic tie-break — the trained labels ARE the SQL ranking, so
    the fitted model is oracle-checkable."""
    from pyspark.ml.feature import StringIndexer

    e = _t(spark, sf_dir, "events")
    model = StringIndexer(
        inputCol="event_type", outputCol="type_index", stringOrderType="frequencyDesc"
    ).fit(e)
    labels = [(lbl, float(i)) for i, lbl in enumerate(model.labelsArray[0])]
    return spark.createDataFrame(labels, "event_type string, type_index double")
