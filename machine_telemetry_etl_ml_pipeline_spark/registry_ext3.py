"""Third extension batch: DDL surface, skew-safe aggregation,
embedding near-dup dedup, and an oracle-checked streaming session
window.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .operators.bucketing import salted_agg, save_bucketed
from .registry import _t, register


@register(
    "ref_ddl_create_table",
    """
    SELECT * FROM (VALUES
      ('machineid', 'string'), ('ts_epoch', 'bigint'),
      ('enginetemperature', 'double'), ('status', 'string'),
      ('status_encoded', 'int')
    ) t(col_name, data_type)
    """,
)
def ref_ddl_create_table(spark, sf_dir):
    """DDL surface — the reference's CREATE TABLE IF NOT EXISTS
    (project/db.py:77-126) as Spark SQL DDL over a parquet location;
    returns the created table's schema as rows. Oracle (round-2
    upgrade): the literal expected schema — checks both the CREATE and
    that the second IF NOT EXISTS was a no-op (a re-create with the
    1-column schema would change the output)."""
    import uuid

    loc = tempfile.mkdtemp(prefix="ddl_") + "/t"
    # unique per invocation: a fixed name would race under concurrent
    # query execution (DROP vs CREATE interleaving)
    name = f"telemetry_ddl_check_{uuid.uuid4().hex[:8]}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {name} (
          machineid STRING, ts_epoch BIGINT, enginetemperature DOUBLE,
          status STRING, status_encoded INT
        ) USING parquet LOCATION '{loc}'
        """
    )
    # idempotency: the reference loops IF NOT EXISTS on every run
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} (machineid STRING) USING parquet LOCATION '{loc}'"
    )
    out = spark.sql(f"DESCRIBE TABLE {name}").select("col_name", "data_type")
    return out.filter(~F.col("col_name").startswith("#"))


@register(
    "ext_salted_agg",
    """
    SELECT event_type, CAST(sum(cnt_events) AS BIGINT) AS cnt_events,
           round(sum(sum_value), 4) AS sum_value
    FROM (
      SELECT event_type, count(*) AS cnt_events, sum(value) AS sum_value
      FROM events GROUP BY event_type
    ) GROUP BY event_type
    """,
)
def ext_salted_agg(spark, sf_dir):
    """Skew-safe two-phase aggregation (salting): event_type has only 5
    values — a worst-case skew shape where every row of a key lands on
    one reducer. The salted plan spreads each key over 8 partial
    groups; the merged result is exactly the plain aggregate (oracle =
    the unsalted SQL; sums are exact-integer cents to make the
    partial-merge order irrelevant)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    out = salted_agg(
        e,
        "event_type",
        [F.count(F.lit(1)).alias("cnt_events"), F.sum("cents").alias("sum_cents")],
    )
    # rename for the algebraic-merge helper, then descale
    return out.select(
        "event_type",
        "cnt_events",
        F.round(F.col("sum_cents") / 100.0, 4).alias("sum_value"),
    )


@register(
    "llm_embedding_neardup",
    """
    WITH bb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN embedding[9] > 0 THEN 2 ELSE 0 END)
                + (CASE WHEN embedding[17] > 0 THEN 4 ELSE 0 END)
                + (CASE WHEN embedding[25] > 0 THEN 8 ELSE 0 END) AS INTEGER) AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 4) AS cosine_sim
    FROM bb a JOIN bb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) > 0.35
    """,
)
def llm_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: candidates from sign-LSH
    buckets (1/16th of the pair space scored), exact cosine filter
    above threshold — the embedding analog of MinHash-LSH + Jaccard
    verification. Norms are precomputed once per vector (r5: the
    inlined cosine() re-folded both norms per pair, twice — filter and
    projection; same floats, ~3x less fold work)."""
    from .llm.similarity import _as_double, dot, norm, sign_bucket

    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        sign_bucket(F.col("embedding"), [1, 9, 17, 25]).alias("bucket"),
    ).withColumn("nrm", norm(F.col("v")))
    a = base.alias("a")
    b = base.alias("b")
    sim = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("a"),
            F.col("b.vec_id").alias("b"),
            sim.alias("sim_raw"),
        )
        .filter(F.col("sim_raw") > 0.35)
        .select("a", "b", F.round(F.col("sim_raw"), 4).alias("cosine_sim"))
    )


@register(
    "stream_session_counts",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def stream_session_counts(spark, sf_dir):
    """Structured Streaming session_window (30 min gap) drained through
    an availableNow memory sink — the ORACLE is the batch
    gaps-and-islands SQL, proving the state-store session merge equals
    the relational formulation. Gap boundary: session_window treats an
    event at exactly prev_ts + gap as a NEW session ([start, end)
    windows), hence `>= 1800` in the oracle — compared in integer
    epoch_us like Spark's own micros arithmetic. The oracle's two
    window passes order by (ts, event_id): without the unique
    tiebreak, DuckDB may re-sort exact-ts ties BETWEEN the lag pass
    and the cumulative-sum pass, detaching the session-start flag
    from the row the cumsum visits first (the 10x replica's 10
    duplicate-ts copies exposed this as 4 misassigned sessions —
    Spark's state-store merge was right, the oracle was wrong)."""
    import uuid

    from .session import tune_session
    from .streaming.windows import events_testdata_stream

    tune_session(spark)
    stream = events_testdata_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("session_start"),
            "n_events",
        )
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "ext_bucketed_join_colocated",
    """
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
           / 10000.0 AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def ext_bucketed_join_colocated(spark, sf_dir):
    """Co-located join on pre-bucketed tables — the 100 TB layout move
    that removes the dominant shuffle of every recurring fact-fact
    join (SURVEY §1.4: the reference's btree indexes become layout).
    Both sides are persisted bucketed by the join key with the SAME
    bucket count, so Catalyst plans a sort-merge join with NO Exchange
    on either side; the only shuffle left in the plan is the final
    5-group rollup. The bucketed write happens once per SF dir
    (exists-check), so a second run — and a bench rep — measures the
    join itself, which is the recurring cost a nightly pipeline pays.
    The oracle recomputes the same revenue rollup from the logical
    inputs, covering the bucketed write + read + join round trip.

    Money math rides integer units (r11): the 100x ledger sweep caught
    this entry's round(sum(price*(1-disc)), 2) one 2dp grid step apart
    between engines — each of the 5 priority groups accumulates ~12M
    order-divergent double terms (~6e11 dollars), the same channel as
    the r11 TPC-H q6/q8/q9/q17 fixes and at exactly the accumulation
    depth where it opens. cents * (100 - pct) is an exact BIGINT in
    1e-4-dollar units, the sum accumulates order-insensitively in
    DECIMAL(38,0), and the one display division by 10000.0 is the
    same IEEE op on both engines. Exactness bound (r12, per ADVICE):
    the "<2^53 integer" qualifier holds while a group's sum stays
    under 2^53 units ≈ $9.0e11; the 100x replica sits at ~6e15 units
    (~1.5x headroom), so it lapses somewhere around a ~150x replica.
    Past that, cross-engine EQUALITY still holds — both engines cast
    the SAME exact DECIMAL integer to double, and round-to-nearest of
    an identical integer is deterministic and identical — only the
    "exactly representable" claim weakens to "identically rounded".
    The oracle mirrors the cast, so the gate stays green at any SF."""
    import hashlib

    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    t_orders, t_items = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    def ensure(df, name, key):
        if spark.catalog.tableExists(name):
            return
        # the catalog is per-session (in-memory metastore) but the
        # warehouse dir persists: a table written by a previous session
        # is an orphaned location here — clear it before recreating
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        save_bucketed(df, name, key, num_buckets=16, sort_col=key)

    ensure(o, t_orders, "o_orderkey")
    ensure(l, t_items, "l_orderkey")
    # merge hint: at bench SFs the orders side fits the broadcast
    # threshold and Catalyst would pick BHJ, never exercising the
    # co-located path; at 100 TB both sides are fact-sized and SMJ is
    # what runs, so pin it
    joined = spark.table(t_orders).hint("merge").join(
        spark.table(t_items),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    keep_pct = 100 - F.round(F.col("l_discount") * 100).cast("long")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum((cents * keep_pct).cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias(
            "revenue"
        ),
    )
