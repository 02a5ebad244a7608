"""Thirteenth extension batch (round 5): streaming-sketch and
classical-analytics surface — a portable Count-Min sketch with exact
cross-engine parity, overlapping-interval merge (the islands variant
the gap/island family was missing), Spearman rank correlation on
integer-exact rank sums, and a cumulative lift/gains table (the
decile-ranked companion to ml_roc_auc / ml_calibration_bins).

The reference has none of these (its analytics stop at GROUP BY
comparisons, project/db.py:329-358); they are the monitoring and
approximate-counting operators a 100 TB deployment runs beside the
exact aggregates this engine already ships.

Determinism contract (same rules as registry_ext12): hashing is
md5-hex (portable across engines), every cross-row reduction is an
integer sum (rank sums are pre-scaled to BIGINTs; CMS cells are
counts), and the only float arithmetic is a final scalar formula over
those exact integers, rounded onto a fixed grid on both sides."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register

# Count-Min sketch geometry: d=4 rows (seeds), w=64 columns. Portable
# row hash: first 8 hex chars of md5(seed || ':' || key) as an integer,
# mod w — byte-identical on Spark and DuckDB, so the sketch itself is
# cross-engine exact, not just the estimates.
_CMS_D = 4
_CMS_W = 64


def _cms_b(seed: int, key_col):
    """Portable CMS row hash (Spark side): first 8 hex chars of
    md5(seed:key) as an integer, mod w — mirrors _cms_bucket_sql."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), key_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )


def _cms_bucket_sql(seed: int, key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_CMS_W})"
    )


@register(
    "ext_count_min_sketch",
    f"""
    WITH cells AS (
      SELECT seed, bucket, count(*) AS c FROM (
        SELECT u.seed,
               CASE u.seed
                 {' '.join(f"WHEN {s} THEN {_cms_bucket_sql(s, 'user_id')}" for s in range(_CMS_D))}
               END AS bucket
        FROM events CROSS JOIN (SELECT unnest(range({_CMS_D})) AS seed) u
      ) GROUP BY seed, bucket
    ),
    probes AS (
      SELECT user_id AS probe, count(*) AS exact_n
      FROM events GROUP BY user_id ORDER BY exact_n DESC, probe ASC LIMIT 20
    ),
    fanned_probes AS (
      SELECT p.probe, p.exact_n, u.seed,
             CASE u.seed
               {' '.join(f"WHEN {s} THEN {_cms_bucket_sql(s, 'p.probe')}" for s in range(_CMS_D))}
             END AS bucket
      FROM probes p CROSS JOIN (SELECT unnest(range({_CMS_D})) AS seed) u
    ),
    est AS (
      SELECT fp.probe, fp.exact_n, min(c.c) AS cms_estimate
      FROM fanned_probes fp JOIN cells c USING (seed, bucket)
      GROUP BY fp.probe, fp.exact_n
    )
    SELECT probe, exact_n, cms_estimate,
           CAST(cms_estimate >= exact_n AS BOOLEAN) AS never_undercounts
    FROM est
    """,
)
def ext_count_min_sketch(spark, sf_dir):
    """Count-Min sketch frequency estimation with a portable md5 row
    hash: build a d=4 x w=64 sketch over events.user_id with one
    partial-aggregable groupBy (the seed fan-out is a 4x row explode
    that collapses to 256 cells map-side), then answer the top-20
    heavy-hitter probes as min-over-rows of their cells. The output
    carries the exact count next to the estimate plus the CMS
    one-sided-error invariant (estimate >= truth, always true by
    construction — checked per row, not assumed). Scale shape: the
    sketch is 256 cells regardless of input rows — THE mergeable
    pre-aggregate for per-key counts at 100 TB (cells add across
    shards/days); probes ride a broadcast join against those cells.
    Reference analog: none — the approximate companion to
    project/db.py:343's exact count-distinct family."""
    e = _t(spark, sf_dir, "events")
    # seed fan-out as a narrow Generate (explode of a 4-element literal
    # array) — no join operator at all, stays inside codegen
    seed_arr = F.array(*[F.lit(s) for s in range(_CMS_D)])
    fanned = e.select("user_id", F.explode(seed_arr).alias("seed"))
    # CASE keyed on seed so Spark and the SQL enumerate identically
    cases = F.when(F.col("seed") == 0, _cms_b(0, F.col("user_id")))
    for s in range(1, _CMS_D):
        cases = cases.when(F.col("seed") == s, _cms_b(s, F.col("user_id")))
    cells = (
        fanned.select("seed", cases.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        e.groupBy(F.col("user_id").alias("probe"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("probe").asc())
        .limit(20)
    )
    pcases = F.when(F.col("seed") == 0, _cms_b(0, F.col("probe")))
    for s in range(1, _CMS_D):
        pcases = pcases.when(F.col("seed") == s, _cms_b(s, F.col("probe")))
    # fan the 20 probes over the 4 seeds so the lookup is a plain
    # (seed, bucket) equi-join — broadcast hash join, not a nested loop
    fanned_probes = probes.select(
        "probe", "exact_n", F.explode(seed_arr).alias("seed")
    ).select("probe", "exact_n", "seed", pcases.alias("bucket"))
    est = (
        cells.join(F.broadcast(fanned_probes), ["seed", "bucket"])
        .groupBy("probe", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "probe",
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_n")).alias("never_undercounts"),
    )


@register(
    "ext_interval_merge",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           min(s) AS start_s, max(e) AS end_s,
           count(*) AS n_events, max(e) - min(s) AS span_s
    FROM islands GROUP BY user_id, island
    """,
)
def ext_interval_merge(spark, sf_dir):
    """Merge overlapping per-user activity intervals (each event claims
    [ts, ts+300s]) into maximal islands — the interval-union variant
    the gap/island family (ext_gap_islands, ext_session_windows) was
    missing: an island boundary opens only where an interval STARTS
    after the running max of all previous ENDS, which differs from
    gap-sessionization whenever an early long interval swallows later
    short ones. Epoch-second integers end to end, so the window max and
    cumulative flag sum are exact on both engines. Scale shape: one
    hash shuffle on user_id, then two sorted window passes inside each
    partition — no self-join, no explode; at 100 TB this is the
    standard plan for machine-uptime / coverage merging."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("s"),
        (F.unix_timestamp("ts").cast("long") + 300).alias("e"),
    )
    # event_id tiebreak makes the ordering TOTAL: with exact (s, e)
    # ties, an engine may re-sort ties between the two window passes
    # (DuckDB did at the tie-dense 10x replica), detaching the
    # island-open flag from the row the cumulative sum visits first
    order = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    flagged = e.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(run).cast("long")
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_s"),
        F.max("e").alias("end_s"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max("e") - F.min("s")).alias("span_s"),
    )


@register(
    "ml_spearman_corr",
    """
    WITH r AS (
      SELECT l_returnflag AS flag,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx2,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry2
      FROM lineitem
    ),
    s AS (
      SELECT flag, count(*) AS n,
             sum(rx2) AS sx, sum(ry2) AS sy,
             sum(rx2 * ry2) AS sxy, sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy
      FROM r GROUP BY flag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) + 0 AS spearman
    FROM s
    """,
)
def ml_spearman_corr(spark, sf_dir):
    """Spearman rank correlation (with ties) between quantity and
    price per returnflag: fractional average ranks are pre-scaled to
    exact integers (2*avg_rank = 2*rank + tie_count - 1 is always a
    BIGINT — the doubling removes the .5s), so every cross-row sum in
    the Pearson-on-ranks formula is an exact integer sum — accumulated
    as DECIMAL(38,0) on the Spark side / HUGEINT on DuckDB, because
    sums of rank squares (~4n^3) blow past BIGINT near 1M rows per
    group (the 10x replica proved it with an ANSI overflow); the single
    float expression at the end consumes those exact integers and is
    therefore the identical double on both engines at any partition
    order, rounded onto a 1e-6 grid. The scale-factor-invariant
    constant 2 cancels in the correlation. Scale shape: two sorted
    windows per group key (rank assignment) + one partial-aggregable
    groupBy; rank() over a hash-partitioned window is the standard
    distributed ranking plan — no driver collection, no sampling.
    Reference analog: none (its stats stop at avg/min/max,
    project/db.py:315-341); this is the monotonic-association screen a
    telemetry fleet runs between sensor channels."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), "l_quantity", "l_extendedprice"
    )
    wq = Window.partitionBy("flag").orderBy("l_quantity")
    wqt = Window.partitionBy("flag", "l_quantity")
    wp = Window.partitionBy("flag").orderBy("l_extendedprice")
    wpt = Window.partitionBy("flag", "l_extendedprice")
    r = li.select(
        "flag",
        (2 * F.rank().over(wq) + F.count(F.lit(1)).over(wqt) - 1).alias("rx2"),
        (2 * F.rank().over(wp) + F.count(F.lit(1)).over(wpt) - 1).alias("ry2"),
    )
    # sums of rank squares exceed BIGINT beyond ~1M rows/group (rank^2
    # ~ 4n^2); accumulate in DECIMAL(38,0) — exact like DuckDB's
    # HUGEINT sum — and only convert to double in the final formula
    dec = "decimal(38,0)"
    s = r.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx2").cast(dec)).alias("sx"),
        F.sum(F.col("ry2").cast(dec)).alias("sy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast(dec)).alias("sxy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast(dec)).alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast(dec)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return s.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        (
            F.round(
                (n * F.col("sxy").cast("double") - sx * sy)
                / (
                    F.sqrt(n * F.col("sxx").cast("double") - sx * sx)
                    * F.sqrt(n * F.col("syy").cast("double") - sy * sy)
                ),
                6,
            )
            + 0
        ).alias("spearman"),
    )


@register(
    "ml_lift_gains",
    """
    WITH scored AS (
      SELECT n_chars AS score, doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    deciled AS (
      SELECT pos, ntile(10) OVER (ORDER BY score DESC, doc_id ASC) AS decile
      FROM scored
    ),
    per AS (
      SELECT decile, count(*) AS n, sum(pos) AS n_pos
      FROM deciled GROUP BY decile
    ),
    tot AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM per)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           round(CAST(sum(n_pos) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(tp AS DOUBLE), 6) + 0 AS cum_gain,
           round((CAST(sum(n_pos) OVER (ORDER BY decile) AS DOUBLE)
                  / CAST(sum(n) OVER (ORDER BY decile) AS DOUBLE))
                 / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) + 0 AS cum_lift
    FROM per CROSS JOIN tot
    """,
)
def ml_lift_gains(spark, sf_dir):
    """Cumulative gains / lift table at score deciles — the
    decile-ranked companion to ml_roc_auc and ml_calibration_bins
    (score = n_chars as the stand-in classifier for lang='en'):
    rows sorted by score into ntile(10) buckets with a deterministic
    (score DESC, doc_id ASC) tiebreak, then per-decile positives,
    cumulative gain (share of all positives captured) and cumulative
    lift (precision so far / base rate). Every reduction is an integer
    count; the gains/lift divisions consume exact BIGINTs, so both
    engines emit identical doubles on the 1e-6 grid. Scale shape: the
    global ntile is one sorted range-partitioned pass (Spark plans a
    single rangepartitioning exchange — the same machinery as a global
    sort, viable because ranking reads each row once); everything
    after runs on 10 rows. At 100 TB the swap-in is the documented
    approx_percentile cut-point variant; this entry keeps the exact
    semantics the oracle can pin."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    deciled = d.select(
        "pos",
        F.ntile(10)
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .alias("decile"),
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    tot = per.agg(F.sum("n").alias("tn"), F.sum("n_pos").alias("tp"))
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.sum("n_pos").over(cum).cast("long").alias("cum_pos"),
            (
                F.round(
                    F.sum("n_pos").over(cum).cast("double") / F.col("tp").cast("double"),
                    6,
                )
                + 0
            ).alias("cum_gain"),
            (
                F.round(
                    (
                        F.sum("n_pos").over(cum).cast("double")
                        / F.sum("n").over(cum).cast("double")
                    )
                    / (F.col("tp").cast("double") / F.col("tn").cast("double")),
                    6,
                )
                + 0
            ).alias("cum_lift"),
        )
    )


@register(
    "stream_chained_window_agg",
    """
    WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS wm FROM events),
    hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h, count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 day', h))) AS BIGINT)
             AS day_start,
           count(*) AS n_hours,
           CAST(sum(n) AS BIGINT) AS n_events,
           max(n) AS max_hourly
    FROM hourly CROSS JOIN wm
    WHERE time_bucket(INTERVAL '1 day', h) + INTERVAL 1 DAY <= wm
    GROUP BY 1
    """,
)
def stream_chained_window_agg(spark, sf_dir):
    """CHAINED stateful streaming aggregations (Spark 3.5+ multiple
    stateful operators): hourly tumbling counts re-aggregated into
    daily (n_hours, n_events, max_hourly) via window(window_time(w)),
    drained append-mode through an availableNow memory sink. The
    oracle pins the exact eviction contract: a daily window emits iff
    its END clears the terminal watermark (max event time - 2h,
    advanced by the final no-data micro-batches, which flush level 1
    and then level 2 in sequence); every hourly window inside such a
    day has already emitted, so the daily row aggregates the complete
    day. Scale shape: two cascaded partial-aggregable stateful ops —
    state is |open hours| + |open days| per key-range, not raw rows;
    this is the standard rollup cascade that replaces a re-read of the
    raw stream at 100 TB/day."""
    import uuid

    from .session import tune_session
    from .streaming.windows import events_testdata_stream

    tune_session(spark)
    stream = events_testdata_stream(spark, sf_dir)
    hourly = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = (
        hourly.groupBy(F.window(F.window_time("w"), "1 day").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("max_hourly"),
        )
        .select(
            F.unix_timestamp(F.col("d.start")).cast("long").alias("day_start"),
            "n_hours",
            "n_events",
            "max_hourly",
        )
    )
    name = f"stream_chain_{uuid.uuid4().hex[:8]}"
    q = (
        daily.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "ext_holt_linear",
    """
    WITH RECURSIVE d AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS x FROM events GROUP BY 1
    ),
    s AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
    h AS (
      SELECT rn, day, x, CAST(x AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.rn, s.day, s.x,
             CAST(0.5 AS DOUBLE) * s.x + CAST(0.5 AS DOUBLE) * (h.l + h.b),
             CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * s.x
                                     + CAST(0.5 AS DOUBLE) * (h.l + h.b)) - h.l)
               + CAST(0.7 AS DOUBLE) * h.b
      FROM h JOIN s ON s.rn = h.rn + 1
    )
    SELECT day, x, l + 0 AS level, b + 0 AS trend,
           (l + b) + 0 AS forecast_next
    FROM h
    """,
)
def ext_holt_linear(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing (alpha=0.5,
    beta=0.3) over the daily event-count series — the trend-aware
    upgrade of ext_ewma_smoothing. The series values are integer day
    counts (one partial-aggregable groupBy), so the sequential fold —
    Spark: a single-row array aggregate() appending (level, trend)
    states; DuckDB: a recursive CTE walking rn+1 — performs the
    IDENTICAL double arithmetic in the identical order on both
    engines, so the raw doubles match bitwise and ship unrounded
    (rounding onto a fixed grid can land exactly ON a .5 boundary,
    where the engines' rounding algorithms disagree). Scale shape: the
    recursion runs on the collapsed per-day table (|days| rows, bounded
    by calendar time, not data volume — 36.5k rows after a century);
    the 100 TB cost is entirely in the first groupBy, which is
    map-side combinable. Reference analog: none (its time features
    stop at calendar extraction, project/db.py:373)."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    folded = d.agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    ).select(
        F.expr(
            """
            aggregate(
              slice(s, 2, greatest(size(s) - 1, 0)),
              array(named_struct(
                'day', element_at(s, 1).day, 'x', element_at(s, 1).x,
                'l', CAST(element_at(s, 1).x AS DOUBLE),
                'b', CAST(0.0 AS DOUBLE))),
              (acc, e) -> array_append(acc, named_struct(
                'day', e.day, 'x', e.x,
                'l', 0.5D * e.x + 0.5D * (element_at(acc, -1).l
                                          + element_at(acc, -1).b),
                'b', 0.3D * ((0.5D * e.x + 0.5D * (element_at(acc, -1).l
                                                   + element_at(acc, -1).b))
                             - element_at(acc, -1).l)
                     + 0.7D * element_at(acc, -1).b))
            ) AS states
            """
        )
    )
    # outputs stay UNROUNDED: the fold's operation tree is identical on
    # both engines (sequential over the same exact integers), so the raw
    # doubles hash-match — while round(x, 6) of a value landing exactly
    # ON a .5 grid point diverges between engines (the tpch_q2 lesson;
    # the 10x replica hit this on forecast_next)
    st = folded.select(F.explode("states").alias("st"))
    return st.select(
        F.col("st.day").alias("day"),
        F.col("st.x").alias("x"),
        (F.col("st.l") + 0).alias("level"),
        (F.col("st.b") + 0).alias("trend"),
        (F.col("st.l") + F.col("st.b") + 0).alias("forecast_next"),
    )
