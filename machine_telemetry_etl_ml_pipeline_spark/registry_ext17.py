"""Seventeenth extension batch (round 6, part 2): survival analysis,
the skyline operator, seasonal decomposition, and two small SQL
surfaces.

- `ml_kaplan_meier`: the Kaplan-Meier product-limit survival curve
  (time from first view to first purchase, censored at end of
  observation) — the time-to-event family the SQL-ML suite lacked.
  Sequential survival product via the ext_holt_linear pattern: a
  single-row array fold on the calendar-bounded step table walks the
  identical double arithmetic as the oracle's recursive CTE, so the
  curve ships UNROUNDED and matches bitwise.
- `ext_skyline_pareto`: the skyline / Pareto-frontier operator
  (non-dominated (price, size) pairs) — classic OLAP operator Spark
  has no built-in for, implemented as two partial-aggregable groupBys
  plus ONE running-max window (O(|distinct prices|)), while the
  oracle is the textbook quadratic NOT EXISTS — the plan asymmetry is
  the point: the engine side never goes O(n^2).
- `ext_seasonal_dow_index`: day-of-week seasonal indices (dow mean /
  grand mean) from exact integer masses — the seasonality screen that
  complements ext_autocorrelation/ext_holt_linear.
- `ext_offset_clause`: LIMIT/OFFSET pagination with a total
  deterministic sort — the cursor-paging surface the reference does
  client-side.
- `ext_union_by_name`: unionByName(allowMissingColumns=True) schema
  alignment — the by-NAME set-op the positional union family missed.

Determinism contract: every aggregate is an exact integer; the only
doubles are sequential-fold survival products (bitwise-identical
operation trees, shipped unrounded) and single fixed IEEE formulas
over exact integers."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register


def _views(spark, sf_dir, *names):
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(n)


# --- survival analysis: Kaplan-Meier product-limit estimator ----------------


@register(
    "ml_kaplan_meier",
    """
    WITH RECURSIVE ue AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END) AS tv,
             min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
               AS tp_any
      FROM events GROUP BY user_id
    ),
    tend AS (SELECT max(CAST(ts AS DATE)) AS te FROM events),
    obs AS (
      SELECT CASE WHEN tp_any IS NOT NULL AND tp_any >= tv
                  THEN CAST(tp_any - tv AS BIGINT)
                  ELSE CAST(te - tv AS BIGINT) END AS t,
             CASE WHEN tp_any IS NOT NULL AND tp_any >= tv
                  THEN 1 ELSE 0 END AS ev
      FROM ue CROSS JOIN tend WHERE tv IS NOT NULL
    ),
    tot AS (SELECT count(*) AS n_total FROM obs),
    by_t AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
                    CAST(count(*) AS BIGINT) AS a
             FROM obs GROUP BY t),
    risk AS (
      SELECT t, d,
             CAST(n_total - coalesce(sum(a) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM by_t CROSS JOIN tot
    ),
    steps AS (SELECT t, d, n, row_number() OVER (ORDER BY t) AS rn
              FROM risk WHERE d > 0),
    km AS (
      SELECT rn, t, d, n,
             CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS s
      FROM steps WHERE rn = 1
      UNION ALL
      SELECT st.rn, st.t, st.d, st.n,
             km.s * (CAST(st.n - st.d AS DOUBLE) / CAST(st.n AS DOUBLE))
      FROM km JOIN steps st ON st.rn = km.rn + 1
    )
    SELECT t AS day_t, d AS n_events, n AS n_at_risk, s + 0 AS survival
    FROM km
    """,
)
def ml_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier product-limit survival curve for time from a
    user's first view to first purchase, right-censored at the end of
    observation — the nonparametric time-to-event estimator
    (churn/conversion-latency analysis), a family the SQL-ML suite
    lacked. Exactness: event/censor day offsets, death counts d_i and
    risk sets n_i are ALL exact integers (one user-keyed groupBy, one
    t-keyed groupBy, one running-sum window); the survival product is
    a sequential fold over the <=|days| step rows — Spark walks it as
    a single-row array aggregate(), DuckDB as a recursive CTE, the
    SAME multiply/divide tree in the same order, so the doubles match
    bitwise and ship unrounded (the ext_holt_linear doctrine). Scale
    shape: the only data-sized work is the first groupBy(user_id)
    (partial-aggregable); everything after runs on calendar-bounded
    tables. Reference analog: none."""
    e = _t(spark, sf_dir, "events")
    ue = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts").cast("date"))
        ).alias("tv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts").cast("date"))
        ).alias("tp_any"),
    )
    tend = e.agg(F.max(F.col("ts").cast("date")).alias("te"))
    has_event = F.col("tp_any").isNotNull() & (F.col("tp_any") >= F.col("tv"))
    obs = (
        ue.filter(F.col("tv").isNotNull())
        .crossJoin(F.broadcast(tend))
        .select(
            F.when(has_event, F.datediff("tp_any", "tv"))
            .otherwise(F.datediff("te", "tv"))
            .cast("long")
            .alias("t"),
            F.when(has_event, 1).otherwise(0).alias("ev"),
        )
    )
    tot = obs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    by_t = obs.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("a"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = by_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("n_total") - F.coalesce(F.sum("a").over(w), F.lit(0)))
        .cast("long")
        .alias("n"),
    )
    steps = risk.filter(F.col("d") > 0)
    folded = steps.agg(
        F.array_sort(F.collect_list(F.struct("t", "d", "n"))).alias("s")
    ).select(
        F.expr(
            """
            aggregate(
              slice(s, 2, greatest(size(s) - 1, 0)),
              array(named_struct(
                't', element_at(s, 1).t, 'd', element_at(s, 1).d,
                'n', element_at(s, 1).n,
                'surv', CAST(element_at(s, 1).n - element_at(s, 1).d AS DOUBLE)
                        / CAST(element_at(s, 1).n AS DOUBLE))),
              (acc, e) -> array_append(acc, named_struct(
                't', e.t, 'd', e.d, 'n', e.n,
                'surv', element_at(acc, -1).surv
                        * (CAST(e.n - e.d AS DOUBLE) / CAST(e.n AS DOUBLE))))
            ) AS states
            """
        )
    )
    st = folded.select(F.explode("states").alias("st"))
    return st.select(
        F.col("st.t").alias("day_t"),
        F.col("st.d").alias("n_events"),
        F.col("st.n").alias("n_at_risk"),
        (F.col("st.surv") + 0).alias("survival"),
    )


# --- skyline / Pareto frontier ----------------------------------------------


@register(
    "ext_skyline_pareto",
    """
    WITH pairs AS (
      SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size,
             count(*) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT p.price_cents, p.size, CAST(p.n_parts AS BIGINT) AS n_parts
    FROM pairs p
    WHERE NOT EXISTS (
      SELECT 1 FROM pairs q
      WHERE q.price_cents <= p.price_cents AND q.size >= p.size
        AND (q.price_cents < p.price_cents OR q.size > p.size)
    )
    """,
)
def ext_skyline_pareto(spark, sf_dir):
    """Skyline (Pareto frontier) of parts: the (price, size) pairs not
    dominated by any cheaper-and-at-least-as-big alternative — the
    classic multi-criteria OLAP operator Spark has no built-in for.
    The engine side is the sort-based skyline: collapse to distinct
    pairs (partial-aggregable), keep the max size per price level,
    then ONE running-max window ordered by price — a pair survives iff
    its size strictly exceeds every strictly-cheaper level's best.
    O(|distinct prices|) after the first groupBy; the ORACLE is the
    textbook quadratic NOT EXISTS, and that asymmetry is the point:
    the distributed plan never goes O(n^2) (the same
    candidate-bounding discipline as the LSH dedup stack). Dominance
    runs on exact integer cents/sizes, so the frontier is unambiguous
    cross-engine. Reference analog: none."""
    p = _t(spark, sf_dir, "part")
    pairs = p.groupBy(
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    best = pairs.groupBy("price_cents").agg(F.max("size").alias("smax"))
    w = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        best.select(
            F.col("price_cents").alias("f_price"),
            F.col("smax"),
            F.max("smax").over(w).alias("prev_max"),
        )
        .filter(F.col("prev_max").isNull() | (F.col("smax") > F.col("prev_max")))
        .select("f_price", "smax")
    )
    return (
        pairs.join(
            frontier,
            (pairs.price_cents == frontier.f_price)
            & (pairs.size == frontier.smax),
        )
        .select("price_cents", "size", "n_parts")
    )


# --- seasonal day-of-week decomposition -------------------------------------


@register(
    "ext_seasonal_dow_index",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS x FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nd_all,
                   CAST(sum(x) AS BIGINT) AS x_all FROM d),
    dw AS (
      SELECT CAST(isodow(day) AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS events
      FROM d GROUP BY 1
    )
    SELECT dow, n_days, events,
           CAST(events AS DOUBLE) * CAST(nd_all AS DOUBLE)
             / (CAST(n_days AS DOUBLE) * CAST(x_all AS DOUBLE))
             AS seasonal_index
    FROM dw CROSS JOIN tot
    """,
)
def ext_seasonal_dow_index(spark, sf_dir):
    """Day-of-week seasonal indices (dow mean rate / grand mean rate)
    over the daily event-count series — the weekly-seasonality screen
    that pairs with ext_autocorrelation (which detects it) and
    ext_holt_linear (which smooths through it). All masses are exact
    integers from two partial-aggregable groupBys; each index is ONE
    fixed IEEE formula (a*b)/(c*d) over exact integers, deterministic
    cross-engine with no rounding pin. ISO weekday numbering is pinned
    on both engines (Spark weekday()+1 == DuckDB isodow: 1=Monday).
    Scale shape: day-keyed partial agg collapses the stream to
    calendar-bounded rows; everything downstream is tiny. Reference
    analog: the dow/hour feature extraction at project/db.py:373, as
    an actual decomposition instead of raw features."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd_all"),
        F.sum("x").cast("long").alias("x_all"),
    )
    dw = d.groupBy((F.weekday("day") + 1).cast("long").alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("events"),
    )
    return dw.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_days",
        "events",
        (
            F.col("events").cast("double")
            * F.col("nd_all").cast("double")
            / (F.col("n_days").cast("double") * F.col("x_all").cast("double"))
        ).alias("seasonal_index"),
    )


# --- LIMIT/OFFSET pagination -------------------------------------------------


@register(
    "ext_offset_clause",
    """
    SELECT c_custkey, c_name,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM customer
    ORDER BY acctbal_cents DESC, c_custkey ASC
    LIMIT 10 OFFSET 20
    """,
)
def ext_offset_clause(spark, sf_dir):
    """LIMIT/OFFSET pagination (page 3 of the balance leaderboard)
    with a TOTAL deterministic sort (integer cents + unique-key
    tiebreak — an OFFSET without one returns engine-dependent pages).
    Spark plans this as TakeOrderedAndProject with a skip: each
    partition contributes its local top-(limit+offset), the driver
    merges and drops the offset — no global sort. At 100 TB deep
    paging (OFFSET 10^9) is an anti-pattern; the keyset-pagination
    replacement (WHERE (bal, key) < last-seen) is the same plan as
    ref_top_k, which is why only the shallow-page surface lives
    here. Reference analog: the client-side row slicing after
    fetchall (project/db.py:237-246)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_name",
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias(
                "acctbal_cents"
            ),
        )
        .orderBy(F.col("acctbal_cents").desc(), F.col("c_custkey").asc())
        .offset(20)
        .limit(10)
    )


# --- unionByName schema alignment -------------------------------------------


@register(
    "ext_union_by_name",
    """
    SELECT event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents,
           'full' AS src
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, event_type, CAST(NULL AS BIGINT) AS cents,
           'slim' AS src
    FROM events WHERE event_type = 'error'
    """,
)
def ext_union_by_name(spark, sf_dir):
    """unionByName(allowMissingColumns=True): the by-NAME set op that
    aligns differently-ordered projections and null-fills columns one
    side lacks — the schema-drift-tolerant append a long-lived
    pipeline needs when shards were written by different code
    versions (positional UNION would silently misalign). The slim
    side deliberately carries its columns in a DIFFERENT order and no
    cents column; the oracle spells out the explicit aligned/NULL
    projection Spark derives. Narrow op — no shuffle, both branches
    scan-prune to their filters."""
    e = _t(spark, sf_dir, "events")
    full = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lit("full").alias("src"),
    )
    slim = e.filter(F.col("event_type") == "error").select(
        F.lit("slim").alias("src"),
        F.col("event_type"),
        F.col("event_id"),
    )
    return full.unionByName(slim, allowMissingColumns=True)


# --- nearest as-of join (completes the backward/forward family) -------------


@register(
    "ext_asof_join_nearest",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    b AS (
      SELECT p.event_id,
             first(v.event_id ORDER BY v.ts DESC, v.event_id) AS b_id,
             first(epoch_us(v.ts) ORDER BY v.ts DESC, v.event_id) AS b_us
      FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
      GROUP BY p.event_id
    ),
    f AS (
      SELECT p.event_id,
             first(v.event_id ORDER BY v.ts ASC, v.event_id) AS f_id,
             first(epoch_us(v.ts) ORDER BY v.ts ASC, v.event_id) AS f_us
      FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
           CAST(CASE
             WHEN b_id IS NULL AND f_id IS NULL THEN NULL
             WHEN f_id IS NULL THEN b_id
             WHEN b_id IS NULL THEN f_id
             WHEN epoch_us(p.ts) - b_us <= f_us - epoch_us(p.ts) THEN b_id
             ELSE f_id END AS BIGINT) AS nearest_event_id,
           CAST(CASE
             WHEN b_id IS NULL AND f_id IS NULL THEN NULL
             WHEN f_id IS NULL THEN epoch_us(p.ts) - b_us
             WHEN b_id IS NULL THEN f_us - epoch_us(p.ts)
             WHEN epoch_us(p.ts) - b_us <= f_us - epoch_us(p.ts)
               THEN epoch_us(p.ts) - b_us
             ELSE f_us - epoch_us(p.ts) END AS BIGINT) AS nearest_dist_us
    FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    """,
)
def ext_asof_join_nearest(spark, sf_dir):
    """Nearest as-of join — for each purchase, the view closest in
    time in EITHER direction, ties broken backward then by smallest
    event_id: completes the as-of family (backward `ext_asof_join`,
    forward `ext_asof_join_forward`). Composed from the two
    union+window passes (operators/joins.py) carrying the candidate
    timestamp, then an exact integer-microsecond distance pick — no
    floats, no partition-order dependence (the forward twin's 10x
    tiebreak lesson baked in from the start). Scale shape: two
    user_id-keyed window passes (a fused implementation could share
    one sort; two passes keep the proven helpers); distance math is
    per-row narrow. The kdb `aj`-nearest / pandas merge_asof
    (direction='nearest') semantics. Reference analog: none."""
    from .operators.joins import asof_join, asof_join_forward

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.col("ts").alias("vts")
    ).select("event_id", "user_id", "ts", "vts")
    back = asof_join(
        p, v.select("user_id", "ts", F.col("event_id").alias("vid"), "vts"),
        "user_id", "ts", "ts", ["vid", "vts"], right_tiebreak="vid",
    ).select(
        "event_id", "user_id", "ts",
        F.col("asof_vid").alias("b_id"),
        # events.ts is TIMESTAMP_NTZ; cast to instant (value-identical
        # under the UTC session zone) for exact integer micros
        F.unix_micros(F.col("asof_vts").cast("timestamp")).alias("b_us"),
    )
    fwd = asof_join_forward(
        p, v.select("user_id", "ts", F.col("event_id").alias("vid"), "vts"),
        "user_id", "ts", "ts", ["vid", "vts"], right_tiebreak="vid",
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("next_vid").alias("f_id"),
        F.unix_micros(F.col("next_vts").cast("timestamp")).alias("f_us"),
    )
    j = back.join(fwd, back.event_id == fwd.f_event_id, "left")
    pus = F.unix_micros(F.col("ts").cast("timestamp"))
    bd = pus - F.col("b_us")
    fd = F.col("f_us") - pus
    both_null = F.col("b_id").isNull() & F.col("f_id").isNull()
    pick_b = F.col("f_id").isNull() | (
        F.col("b_id").isNotNull() & (bd <= fd)
    )
    return j.select(
        "event_id",
        "user_id",
        pus.cast("long").alias("ts_us"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(pick_b, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .cast("long")
        .alias("nearest_event_id"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(pick_b, bd)
        .otherwise(fd)
        .cast("long")
        .alias("nearest_dist_us"),
    )


# --- deterministic mode aggregate -------------------------------------------


@register(
    "ext_mode_aggregate",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           first(cents ORDER BY cnt DESC, cents ASC) AS mode_cents,
           CAST(first(cnt ORDER BY cnt DESC, cents ASC) AS BIGINT) AS mode_count,
           CAST(count(*) AS BIGINT) AS n_distinct
    FROM c GROUP BY event_type
    """,
)
def ext_mode_aggregate(spark, sf_dir):
    """Statistical mode per group with a PINNED tie rule (highest
    count, then smallest value) — both engines ship a native mode()
    whose tie choice is unspecified/engine-dependent, so the portable
    formulation is the count-then-argmax: one partial-aggregable
    groupBy collapses the facts to (group, value, count), then a
    per-group WindowGroupLimit top-1 picks deterministically. Scale
    shape: the candidate table is bounded by distinct (group, value)
    pairs; nothing data-sized past the first combine. Reference
    analog: none (its aggregates stop at min/max/avg/count,
    project/db.py:331-339)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("cents").asc()
    )
    nd = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    top = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("cents").alias("mode_cents"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )
    return top.join(nd, "event_type")


# --- quantile-forecast evaluation: pinball (quantile) loss ------------------


@register(
    "ml_quantile_pinball_eval",
    """
    WITH y AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    fc AS (
      SELECT event_type,
             CAST(round(quantile_cont(cents, 0.1)) AS BIGINT) AS f1,
             CAST(round(quantile_cont(cents, 0.5)) AS BIGINT) AS f5,
             CAST(round(quantile_cont(cents, 0.9)) AS BIGINT) AS f9
      FROM y GROUP BY event_type
    ),
    terms AS (
      SELECT y.event_type, q10,
             CASE q10 WHEN 1 THEN greatest(1 * (cents - f1),
                                           (1 - 10) * (cents - f1))
                      WHEN 5 THEN greatest(5 * (cents - f5),
                                           (5 - 10) * (cents - f5))
                      ELSE greatest(9 * (cents - f9),
                                    (9 - 10) * (cents - f9)) END AS t10
      FROM y JOIN fc USING (event_type)
      CROSS JOIN (SELECT unnest([1, 5, 9]) AS q10)
    )
    SELECT event_type, CAST(q10 AS BIGINT) AS q10,
           CAST(sum(t10) AS BIGINT) AS loss_sum_e1,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(t10) AS DOUBLE) / (10 * count(*)) AS mean_pinball
    FROM terms GROUP BY event_type, q10
    """,
)
def ml_quantile_pinball_eval(spark, sf_dir):
    """Pinball (quantile) loss evaluation of P10/P50/P90 per-group
    quantile forecasts against the observed cents — the scoring rule
    for quantile-forecast models (SLO latency forecasting, demand
    bands). The forecast is the exact interpolated percentile ROUNDED
    to integer cents, so every per-row loss term is an EXACT integer
    (scaled x10: max(q10*d, (q10-10)*d) with q10 in {1,5,9}); the sums
    are order-independent BIGINTs and only the final mean divides to
    double. In-query invariant: each loss_sum is minimal at its own
    quantile by construction of the estimator (asserted in tests
    against shifted forecasts). Scale shape: one grouped exact
    percentile (partial-aggregable sketch pass), forecasts broadcast
    back, one more partial-aggregable sum — two scans total, no
    window. Reference analog: none (model eval happens offline in
    sklearn there)."""
    e = _t(spark, sf_dir, "events")
    y = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    fc = y.groupBy("event_type").agg(
        F.round(F.percentile("cents", F.lit(0.1))).cast("long").alias("f1"),
        F.round(F.percentile("cents", F.lit(0.5))).cast("long").alias("f5"),
        F.round(F.percentile("cents", F.lit(0.9))).cast("long").alias("f9"),
    )
    q = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(9))).alias("q10")
    )
    joined = y.join(F.broadcast(fc), "event_type").crossJoin(F.broadcast(q))
    d = (
        F.when(F.col("q10") == 1, F.col("cents") - F.col("f1"))
        .when(F.col("q10") == 5, F.col("cents") - F.col("f5"))
        .otherwise(F.col("cents") - F.col("f9"))
    )
    t10 = F.greatest(F.col("q10") * d, (F.col("q10") - 10) * d)
    return joined.groupBy("event_type", "q10").agg(
        F.sum(t10.cast("decimal(38,0)")).cast("long").alias("loss_sum_e1"),
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(t10.cast("decimal(38,0)")).cast("double") / (10 * F.count(F.lit(1))))
        .alias("mean_pinball"),
    )


# --- isotonic regression (minimax form on the candidate table) --------------


@register(
    "ml_isotonic_regression",
    """
    WITH lab AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    pv AS (SELECT q, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
           FROM lab GROUP BY q),
    idx AS (SELECT q, n, s, row_number() OVER (ORDER BY q) AS k FROM pv),
    cum AS (SELECT q, k, n, s,
                   sum(n) OVER w AS cn, sum(s) OVER w AS cs
            FROM idx WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW)),
    spans AS (
      SELECT i.k AS i, j.k AS j,
             CAST(j.cs - coalesce(ip.cs, 0) AS DOUBLE)
               / CAST(j.cn - coalesce(ip.cn, 0) AS DOUBLE) AS m
      FROM cum i JOIN cum j ON j.k >= i.k
      LEFT JOIN cum ip ON ip.k = i.k - 1
    ),
    mins AS (SELECT i, min(m) AS mn FROM spans GROUP BY i),
    iso AS (
      SELECT c.k, c.q, c.n, c.s, max(mn.mn) AS fit
      FROM cum c JOIN mins mn ON mn.i <= c.k
      GROUP BY c.k, c.q, c.n, c.s
    )
    SELECT q, n, s AS positives, round(fit, 9) + 0 AS iso_rate
    FROM iso
    """,
)
def ml_isotonic_regression(spark, sf_dir):
    """Isotonic regression of the return rate on quantity via the
    closed-form minimax characterization: iso(k) = max_{i<=k}
    min_{j>=i} mean(y[i..j]) — the PAVA result without PAVA's
    sequential pool merging, so it distributes: one partial-aggregable
    groupBy collapses the facts to |distinct q| candidates (50 here;
    quantile-binned at 100 TB), and the span/min/max cascade runs
    entirely on that bounded table (1275 spans for 50 levels — the
    candidate-table discipline of ml_decision_stump). Span means are
    doubles from exact integer prefix sums — identical IEEE divisions
    on both engines; the monotone fit is rounded 1e-9 only at the
    output. Isotonic calibration is the score-calibration step
    (sklearn IsotonicRegression / calibrated classifiers) the
    reference's offline sklearn stack would run — here as relational
    algebra. Monotonicity + pool-mean invariants test-asserted."""
    li = _t(spark, sf_dir, "lineitem")
    lab = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    pv = lab.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    wk = Window.orderBy("q")
    wc = wk.rowsBetween(Window.unboundedPreceding, 0)
    cum = pv.select(
        "q",
        F.row_number().over(wk).alias("k"),
        "n",
        "s",
        F.sum("n").over(wc).alias("cn"),
        F.sum("s").over(wc).alias("cs"),
    )
    ci = cum.select(
        F.col("k").alias("i"),
        (F.col("cn") - F.col("n")).alias("pn"),
        (F.col("cs") - F.col("s")).alias("ps"),
    )
    cj = cum.select(F.col("k").alias("j"), F.col("cn").alias("jn"), F.col("cs").alias("js"))
    spans = ci.join(cj, F.col("j") >= F.col("i")).select(
        "i",
        (
            (F.col("js") - F.col("ps")).cast("double")
            / (F.col("jn") - F.col("pn")).cast("double")
        ).alias("m"),
    )
    mins = spans.groupBy("i").agg(F.min("m").alias("mn"))
    iso = (
        cum.join(mins, mins.i <= cum.k)
        .groupBy("k", "q", "n", "s")
        .agg(F.max("mn").alias("fit"))
    )
    return iso.select(
        "q",
        "n",
        F.col("s").alias("positives"),
        (F.round("fit", 9) + 0).alias("iso_rate"),
    )


# --- CDC snapshot diff -------------------------------------------------------


@register(
    "ext_snapshot_diff_cdc",
    """
    WITH old AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 10 < 7
    ),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 100 = 55 THEN 'X' ELSE o_orderstatus END AS st,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               + CASE WHEN o_orderkey % 100 = 44 THEN 1 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 10 > 2
    )
    SELECT change,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS key_digest
    FROM (
      SELECT coalesce(o.k, n.k) AS k,
             CASE WHEN o.k IS NULL THEN 'insert'
                  WHEN n.k IS NULL THEN 'delete'
                  WHEN o.st <> n.st OR o.cents <> n.cents THEN 'update'
                  ELSE 'unchanged' END AS change
      FROM old o FULL OUTER JOIN new n ON o.k = n.k
    ) GROUP BY change
    """,
)
def ext_snapshot_diff_cdc(spark, sf_dir):
    """Snapshot-diff change-data-capture: given two table versions
    (deterministically derived old/new slices with status flips and
    cent bumps injected INSIDE the key overlap), classify every key as insert / delete /
    update / unchanged via ONE full outer join on the key plus a
    column compare — the diff step of a snapshot-based CDC pipeline
    (the batch complement of stream_update_mode_upsert's CDC-out, and
    what feeds ext_merge_upsert's MERGE). At 100 TB both sides
    bucket/partition by the key so the outer join is co-located
    (ext_bucketed_join_colocated's layout move); with deletion-vector
    formats the delete class arrives for free, which is out of this
    container's scope and documented here instead. Row identity is
    pinned by exact integers (keys, cents), so the class counts and
    key digests are engine-exact."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    old = o.filter(F.col("o_orderkey") % 10 < 7).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("cents"),
    )
    new = o.filter(F.col("o_orderkey") % 10 > 2).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 100 == 55, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("st"),
        (cents + F.when(F.col("o_orderkey") % 100 == 44, 1).otherwise(0)).alias(
            "cents"
        ),
    )
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    classified = j.select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("k"),
        F.when(F.col("o.k").isNull(), "insert")
        .when(F.col("n.k").isNull(), "delete")
        .when(
            (F.col("o.st") != F.col("n.st")) | (F.col("o.cents") != F.col("n.cents")),
            "update",
        )
        .otherwise("unchanged")
        .alias("change"),
    )
    return classified.groupBy("change").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("key_digest"),
    )


# --- BPE tokenizer induction: the ITERATE step (merge -> re-pair) -----------


@register(
    "llm_bpe_merge_iterate",
    """
    WITH RECURSIVE ws AS (
      SELECT row_number() OVER () AS did,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    p1 AS (
      SELECT ws[i] AS a, ws[i + 1] AS b
      FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM ws WHERE len(ws) > 1)
    ),
    m1 AS (
      SELECT a, b, a || '_' || b AS m
      FROM (SELECT a, b, count(*) AS n FROM p1 GROUP BY a, b
            ORDER BY n DESC, a ASC, b ASC LIMIT 1)
    ),
    walk AS (
      SELECT did, 0 AS i, CAST([] AS VARCHAR[]) AS acc FROM ws
      UNION ALL
      SELECT w.did, walk.i + 1,
             CASE WHEN len(walk.acc) > 0
                       AND walk.acc[len(walk.acc)] = m1.a
                       AND w.ws[walk.i + 1] = m1.b
                  THEN walk.acc[1:len(walk.acc) - 1] || [m1.m]
                  ELSE walk.acc || [w.ws[walk.i + 1]] END
      FROM walk JOIN ws w ON w.did = walk.did CROSS JOIN m1
      WHERE walk.i < len(w.ws)
    ),
    merged AS (
      SELECT walk.did, walk.acc
      FROM walk JOIN ws ON ws.did = walk.did
      WHERE walk.i = len(ws.ws)
    ),
    p2 AS (
      SELECT acc[i] || ' ' || acc[i + 1] AS pair
      FROM (SELECT acc, unnest(generate_series(1, len(acc) - 1)) AS i
            FROM merged WHERE len(acc) > 1)
    )
    SELECT pair, count(*) AS n
    FROM p2 GROUP BY pair
    ORDER BY n DESC, pair ASC
    LIMIT 10
    """,
)
def llm_bpe_merge_iterate(spark, sf_dir):
    """BPE tokenizer induction, the ITERATE step llm_bpe_merge_step
    stops short of: pick the top adjacent pair (count desc, pair-text
    tiebreak), APPLY the merge to every symbol sequence (greedy
    left-to-right non-overlapping — the fold keeps the merged token
    only when the accumulator's last symbol is exactly `a`, so a
    freshly merged token never double-merges), then recount adjacent
    pairs and emit the next top-10 — the trainer's inner loop, one
    full round. Spark applies the merge as a per-row array aggregate()
    fold (narrow, no shuffle); the pair counts are the same
    zip_with-shifted-slices Generate as the first-step entry, so each
    round costs ONE (pair, partial-count) shuffle — at 100 TB a K-merge
    trainer is K narrow passes + K sketch-sized shuffles over
    sequences that SHRINK every round. The oracle replays the fold as
    a per-document recursive CTE (token-bounded recursion). Reference
    analog: none."""
    d = _t(spark, sf_dir, "documents")
    from .llm.textstats import words_col

    ws = words_col(F.col("text"))
    n = F.size(ws)
    pair_a = F.explode(
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
    )
    m1 = (
        d.filter(n > 1)
        .select(pair_a.alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(1)
        .select("a", "b", F.concat("a", F.lit("_"), "b").alias("m"))
    )
    applied = d.select(ws.alias("ws")).crossJoin(F.broadcast(m1)).select(
        F.expr(
            """
            aggregate(
              ws,
              CAST(array() AS ARRAY<STRING>),
              (acc, c) -> CASE
                WHEN size(acc) > 0 AND element_at(acc, -1) = a AND c = b
                THEN array_append(slice(acc, 1, size(acc) - 1), m)
                ELSE array_append(acc, c) END
            ) AS acc
            """
        )
    )
    an = F.size(F.col("acc"))
    pairs2 = F.zip_with(
        F.slice(F.col("acc"), 1, an - 1),
        F.slice(F.col("acc"), 2, an - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        applied.filter(an > 1)
        .select(F.explode(pairs2).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(10)
    )


# --- OLS inference: slope/intercept with standard errors and t-stats --------


@register(
    "ml_ols_inference",
    """
    WITH d AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    mom AS (
      SELECT flag, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx_r, sum(x * y) AS sxy_r,
             sum(y * y) AS syy_r
      FROM d GROUP BY flag
    ),
    c AS (
      SELECT flag, n,
             n * sxx_r - sx * sx AS sxx,
             n * sxy_r - sx * sy AS sxy,
             n * syy_r - sy * sy AS syy,
             sx, sy
      FROM mom
    )
    SELECT flag, n,
           round(CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE), 9) + 0 AS slope,
           round((CAST(sy AS DOUBLE) - (CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))
                  * CAST(sx AS DOUBLE)) / n, 9) + 0 AS intercept,
           round(CAST(sxy AS DOUBLE) * CAST(sxy AS DOUBLE)
                 / (CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 9) + 0 AS r2,
           round(sqrt((CAST(syy AS DOUBLE) / CAST(sxx AS DOUBLE)
                       - (CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))
                         * (CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE)))
                      / (n - 2)), 9) + 0 AS se_slope,
           round((CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))
                 / sqrt((CAST(syy AS DOUBLE) / CAST(sxx AS DOUBLE)
                         - (CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))
                           * (CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE)))
                        / (n - 2)), 6) + 0 AS t_stat
    FROM c
    """,
)
def ml_ols_inference(spark, sf_dir):
    """OLS with INFERENCE — slope, intercept, R^2, the slope's
    standard error, and its t statistic per group — the step past
    ml_linear_regression_sql's point estimates that makes the
    regression a hypothesis test (is the quantity-price relation
    significant per return class?). One partial-aggregable moment
    sketch per group (n, Sx, Sy, Sxx, Sxy, Syy as exact
    DECIMAL(38,0)/HUGEINT integers over cents), then every statistic
    is a fixed IEEE formula over the exact centered moments
    n*Sxx - Sx^2 etc. — sqrt is correctly rounded per IEEE-754 (unlike
    ln/exp), so both engines produce identical doubles, rounded 1e-9
    (t at 1e-6) only at the output. Scale shape: one scan, one 6-sum
    combine — the cheapest possible distributed regression, and the
    same sketch a 100 TB run would compute. Reference analog: the
    offline sklearn fit at database_and_model_tools.py:141-157, as
    in-engine inference."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    d = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("y"),
    )
    mom = d.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx_r"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy_r"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy_r"),
    )
    c = mom.select(
        "flag",
        "n",
        (F.col("n") * F.col("sxx_r") - F.col("sx") * F.col("sx")).alias("sxx"),
        (F.col("n") * F.col("sxy_r") - F.col("sx") * F.col("sy")).alias("sxy"),
        (F.col("n") * F.col("syy_r") - F.col("sy") * F.col("sy")).alias("syy"),
        "sx",
        "sy",
    )
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    slope = sxy / sxx
    se = F.sqrt((syy / sxx - slope * slope) / (F.col("n") - 2))
    return c.select(
        "flag",
        "n",
        (F.round(slope, 9) + 0).alias("slope"),
        (
            F.round((F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                    / F.col("n"), 9) + 0
        ).alias("intercept"),
        (F.round(sxy * sxy / (sxx * syy), 9) + 0).alias("r2"),
        (F.round(se, 9) + 0).alias("se_slope"),
        (F.round(slope / se, 6) + 0).alias("t_stat"),
    )


# --- mergeable heavy-hitters sketch (accumulate / combine / estimate) -------


@register(
    "ext_approx_top_k_sketch_merge",
    """
    WITH words AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    )
    SELECT w AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM words GROUP BY w
    ORDER BY cnt DESC, item ASC LIMIT 5
    """,
)
def ext_approx_top_k_sketch_merge(spark, sf_dir):
    """Mergeable heavy-hitters: per-SOURCE partial approx_top_k
    sketches accumulated in one pass, COMBINED into a single sketch,
    then estimated — the Spark-4 accumulate/combine/estimate API that
    makes the frequency sketch re-aggregable exactly like a rollup
    partial (the 100 TB shape: each shard/day keeps a tiny sketch,
    the global top-k is a combine over sketches, and NO re-scan of
    history is ever needed — the sketch sibling of
    ext_incremental_rollup). At this vocabulary (31 synthetic words,
    sketch capacity 64 >> vocab) the estimates are EXACT, so the
    oracle is the exact top-5; the top-10 estimate is re-sorted with
    the (count desc, item asc) tiebreak before the cut so boundary
    ties are pinned. On heavy-tailed data the check would become an
    invariant (estimate >= true count - error bound) instead."""
    d = _t(spark, sf_dir, "documents")
    from .llm.textstats import words_col

    words = d.select(
        "source", F.explode(words_col(F.col("text"))).alias("w")
    )
    partial = words.groupBy("source").agg(
        F.expr("approx_top_k_accumulate(w, 64)").alias("sk")
    )
    combined = partial.agg(F.expr("approx_top_k_combine(sk, 64)").alias("sk"))
    est = combined.select(
        F.explode(F.expr("approx_top_k_estimate(sk, 10)")).alias("e")
    ).select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
    return est.orderBy(F.desc("cnt"), F.asc("item")).limit(5)


# --- Spark 4 Python STREAMING data source ------------------------------------


@register(
    "stream_python_datasource",
    """
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS sum_v,
           CAST(sum(CASE WHEN v % 7 = 0 THEN v * v END) AS BIGINT)
             AS sum_sq_sevens
    FROM (SELECT unnest(generate_series(0, 2999)) AS v)
    """,
)
def stream_python_datasource(spark, sf_dir):
    """Spark-4 Python STREAMING Data Source (SimpleDataSourceStreamReader):
    a custom offset-tracked source emits 3000 deterministic rows in
    1000-row batches; the engine's Python streaming wrapper does not
    yet support Trigger.AvailableNow (it logs the single-batch
    fallback), so the entry drives the drain the way an operator
    would — repeated restarts against ONE checkpoint — which is
    itself the exactly-once contract under test: every restart resumes
    from the committed offset, no batch is skipped or double-read, and
    the final table digests to the closed-form oracle. The batch twin
    is ext_python_datasource; together they close the custom-source
    matrix. Scale shape: offsets are per-source bookkeeping, rows
    stream through without a shuffle until the digest."""
    import shutil
    import tempfile

    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class _Reader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"x": 0}

        def read(self, start):
            x = start["x"]
            if x >= 3000:
                return (iter([]), {"x": x})
            return (iter([(v,) for v in range(x, x + 1000)]), {"x": x + 1000})

    class _Src(DataSource):
        @classmethod
        def name(cls):
            return "graft_rng_stream"

        def schema(self):
            return StructType([StructField("v", LongType())])

        def simpleStreamReader(self, schema):
            return _Reader()

    spark.dataSource.register(_Src)
    work = tempfile.mkdtemp(prefix="pyds_stream_")
    try:
        for _ in range(4):  # 3 data batches + 1 empty terminal batch
            q = (
                spark.readStream.format("graft_rng_stream")
                .load()
                .writeStream.format("parquet")
                .option("path", f"{work}/t")
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        back = spark.read.parquet(f"{work}/t")
        out = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.sum(
                F.when(F.col("v") % 7 == 0, F.col("v") * F.col("v"))
            ).alias("sum_sq_sevens"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- streaming sessionization with a DYNAMIC per-event gap -------------------


@register(
    "stream_session_dynamic_gap",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             CASE WHEN event_type = 'click' THEN 1800000000
                  ELSE 3600000000 END AS gap
      FROM events
    ),
    o AS (
      SELECT user_id, event_id, t, gap,
             max(t + gap) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_end
      FROM e
    ),
    m AS (
      SELECT user_id, event_id, t, gap,
             CASE WHEN prev_end IS NULL OR t >= prev_end THEN 1 ELSE 0 END
               AS is_start
      FROM o
    ),
    s AS (
      SELECT user_id, t, gap,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           CAST(min(t) // 1000000 AS BIGINT) AS sess_start,
           CAST(max(t + gap) // 1000000 AS BIGINT) AS sess_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_dynamic_gap(spark, sf_dir):
    """STREAMING session_window with a DYNAMIC per-event gap (30 min
    for clicks, 60 min otherwise) — the stateful twin of
    ext_session_dynamic_gap, draining the events stream through the
    session state store under an availableNow trigger. The state
    store must perform the same interval-union merge the batch oracle
    expresses as a running max of window ends in exact epoch-micros —
    a per-event gap means sessions EXTEND differently per event type,
    the case fixed-gap streaming sessionization cannot express. Same
    oracle as the batch twin: equal results prove state-store merge ==
    relational formulation. Scale shape: state is per-(user, open
    session), evicted at the watermark; the drain is one availableNow
    pass. Watermark-eviction behavior under genuinely LATE data
    (drop below the horizon, finalize-on-pass) is proven by
    tests/test_streaming.py::test_dynamic_gap_watermark_eviction on
    the same shared aggregation (streaming/windows.py
    dynamic_gap_sessions)."""
    import uuid

    from .session import tune_session
    from .streaming.windows import dynamic_gap_sessions, events_testdata_stream

    tune_session(spark)
    agg = dynamic_gap_sessions(events_testdata_stream(spark, sf_dir))
    name = f"stream_dyn_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- map higher-order functions (transform_values/map_filter/map_zip_with) --


@register(
    "ext_map_higher_order",
    """
    WITH g AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
      FROM events GROUP BY user_id, event_type
    ),
    u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_types_total,
             CAST(sum(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_types_big
      FROM g GROUP BY user_id
    )
    SELECT g.user_id, g.event_type, g.n,
           CAST(g.s // g.n AS BIGINT) AS avg_cents,
           u.n_types_total, u.n_types_big
    FROM g JOIN u USING (user_id)
    WHERE g.n >= 3
    """,
)
def ext_map_higher_order(spark, sf_dir):
    """Map higher-order functions — map_from_entries, map_zip_with
    (count-map x sum-map -> integer-div average map), map_filter
    (drop sparse keys), map_keys/size — the map-typed lambda family
    the array higher-order entry (ext_higher_order_funcs) doesn't
    touch. The per-user maps are built from unique keys so collect
    order cannot matter, every derived value is an exact integer, and
    the final explode projects the maps back to rows — which is the
    point the oracle makes: the map plumbing is pure representation,
    the relational answer is unchanged (the oracle never builds a
    map). All lambdas run in codegen; one user-keyed exchange feeds
    both the map build and the per-user totals. Reference analog: the
    JSONB props introspection at project/db.py (maps as the typed
    upgrade)."""
    e = _t(spark, sf_dir, "events")
    g = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("s"),
    )
    maps = g.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m_n"),
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "s"))
        ).alias("m_s"),
    )
    derived = maps.select(
        "user_id",
        F.expr("map_zip_with(m_n, m_s, (k, n, s) -> s div n)").alias("m_avg"),
        F.expr("map_filter(m_n, (k, v) -> v >= 3)").alias("m_big"),
        F.size("m_n").cast("long").alias("n_types_total"),
        F.expr("CAST(size(map_filter(m_n, (k, v) -> v >= 3)) AS BIGINT)").alias(
            "n_types_big"
        ),
    )
    ex = derived.select(
        "user_id",
        "n_types_total",
        "n_types_big",
        F.explode(F.expr("map_zip_with(m_big, m_avg, (k, n, a) -> struct(n, a))")).alias(
            "event_type", "v"
        ),
    ).filter(F.col("v.n").isNotNull())
    return ex.select(
        "user_id",
        "event_type",
        F.col("v.n").alias("n"),
        F.col("v.a").alias("avg_cents"),
        "n_types_total",
        "n_types_big",
    )


# --- uncertainty quantification: deterministic subsample CI ------------------


_CI_B = 20
_CI_THRESH = 2147483648  # 2^31: ~50% inclusion on a 32-bit md5 prefix


def _ci_oracle() -> str:
    terms = []
    for i in range(1, _CI_B + 1):
        h = (
            f"('0x' || substr(md5(CAST(event_id AS VARCHAR) || '_{i}'), 1, 8))"
            f"::BIGINT < {_CI_THRESH}"
        )
        terms.append(
            f"CAST(sum(CASE WHEN {h} THEN cents END) AS DOUBLE)"
            f" / sum(CASE WHEN {h} THEN 1 END) AS m{i}"
        )
    means = ", ".join(f"m{i}" for i in range(1, _CI_B + 1))
    return f"""
    WITH c AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    wide AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             {', '.join(terms)}
      FROM c
    ),
    reps AS (SELECT n, s, unnest([{means}]) AS m FROM wide)
    SELECT n, CAST({_CI_B} AS BIGINT) AS n_replicates,
           round(CAST(s AS DOUBLE) / n, 6) + 0 AS point_mean,
           round(quantile_cont(m, 0.025), 6) + 0 AS ci_lo,
           round(quantile_cont(m, 0.975), 6) + 0 AS ci_hi
    FROM reps GROUP BY n, s
    """


@register("ml_subsample_ci", _ci_oracle())
def ml_subsample_ci(spark, sf_dir):
    """Uncertainty quantification for the global mean: a 20-replicate
    DETERMINISTIC half-subsample distribution (row r joins replicate i
    iff a 32-bit md5 prefix of (event_id, i) clears a fixed threshold
    — the portable-hash trick every sampler in this repo uses, so both
    engines draw the identical pseudo-samples with no RNG), with the
    2.5/97.5 percentile band of the replicate means as the interval —
    m-out-of-n subsampling, the distributable cousin of the bootstrap.
    Plan shape: ONE scan with 40 conditional partial-aggregable sums
    (no explode — a naive bootstrap materializes B copies of the data;
    this never replicates a row), then the percentile runs over a
    B-row table. Replicate means are single divisions of exact integer
    sums; the band interpolates identical doubles on both engines.
    Reference analog: none (its stats stop at point estimates)."""
    e = _t(spark, sf_dir, "events")
    c = e.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    ]
    for i in range(1, _CI_B + 1):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit(f"_{i}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long") < F.lit(_CI_THRESH)
        aggs.append(
            (
                F.sum(F.when(h, F.col("cents"))).cast("double")
                / F.sum(F.when(h, 1))
            ).alias(f"m{i}")
        )
    wide = c.agg(*aggs)
    reps = wide.select(
        "n",
        "s",
        F.explode(F.array(*[F.col(f"m{i}") for i in range(1, _CI_B + 1)])).alias("m"),
    )
    return reps.groupBy("n", "s").agg(
        F.lit(_CI_B).cast("long").alias("n_replicates"),
        (F.round(F.col("s").cast("double") / F.col("n"), 6) + 0).alias("point_mean"),
        (F.round(F.percentile("m", F.lit(0.025)), 6) + 0).alias("ci_lo"),
        (F.round(F.percentile("m", F.lit(0.975)), 6) + 0).alias("ci_hi"),
    ).drop("s").select("n", "n_replicates", "point_mean", "ci_lo", "ci_hi")


# --- as-of join with a match tolerance ---------------------------------------


@register(
    "ext_asof_join_tolerance",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    b AS (
      SELECT p.event_id,
             first(v.event_id ORDER BY v.ts DESC, v.event_id) AS b_id,
             first(epoch_us(v.ts) ORDER BY v.ts DESC, v.event_id) AS b_us
      FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
           CAST(CASE WHEN epoch_us(p.ts) - b_us <= 3600000000
                     THEN b_id END AS BIGINT) AS asof_event_id,
           CAST(CASE WHEN epoch_us(p.ts) - b_us <= 3600000000
                     THEN epoch_us(p.ts) - b_us END AS BIGINT) AS age_us
    FROM p LEFT JOIN b USING (event_id)
    """,
)
def ext_asof_join_tolerance(spark, sf_dir):
    """Backward as-of join with a MATCH TOLERANCE (1 hour): a stale
    quote is worse than no quote, so carries older than the tolerance
    become NULL — pandas merge_asof(tolerance=...), kdb `wj` window
    semantics; the staleness guard every real-time feature store
    applies to point-in-time lookups. Implementation: the proven
    union+window backward pass carries the candidate timestamp, and
    the tolerance is ONE narrow null-out predicate on exact integer
    microseconds — no extra shuffle over the plain as-of. Completes
    the as-of matrix: backward / forward / nearest / tolerance."""
    from .operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("vid"), F.col("ts").alias("vts")
    )
    back = asof_join(
        p, v, "user_id", "ts", "ts", ["vid", "vts"], right_tiebreak="vid"
    )
    pus = F.unix_micros(F.col("ts").cast("timestamp"))
    age = pus - F.unix_micros(F.col("asof_vts").cast("timestamp"))
    in_tol = age <= 3600000000
    return back.select(
        "event_id",
        "user_id",
        pus.cast("long").alias("ts_us"),
        F.when(in_tol, F.col("asof_vid")).cast("long").alias("asof_event_id"),
        F.when(in_tol, age).cast("long").alias("age_us"),
    )


# --- inequality analytics: Gini coefficient + Lorenz deciles -----------------


@register(
    "ml_gini_lorenz",
    """
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id
      FROM events
    ),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, event_id) AS i,
             ntile(10) OVER (ORDER BY cents, event_id) AS decile
      FROM c
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS s,
                 sum(CAST(i AS DECIMAL(38,0)) * cents) AS iws
          FROM r),
    dec AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS mass
      FROM r GROUP BY decile
    )
    SELECT decile, n_rows, mass,
           round(CAST(mass AS DOUBLE) / s, 6) + 0 AS mass_share,
           round((2.0 * CAST(iws AS DOUBLE) / (CAST(n AS DOUBLE) * s))
                 - (CAST(n AS DOUBLE) + 1) / n, 6) + 0 AS gini
    FROM dec CROSS JOIN t
    """,
)
def ml_gini_lorenz(spark, sf_dir):
    """Gini coefficient + Lorenz decile masses of the event-value
    distribution — the inequality/concentration readout (how skewed is
    spend across events?) behind fairness dashboards and long-tail
    corpus analyses. Closed form G = 2*Σ(i*x_(i))/(n*Σx) - (n+1)/n
    over the globally sorted values: ONE range-partitioned sorted pass
    (the same single global ordering ml_lift_gains already budgets
    for), rank-weighted mass in a DECIMAL(38,0)/HUGEINT accumulator
    (rank x cents exceeds BIGINT long before 100 TB), deciles from the
    identical ordering via ntile, and the final statistic is one fixed
    IEEE formula over exact integers. The (cents, event_id) total
    order pins tie handling on both engines. Reference analog: none
    (its aggregates stop at min/max/avg)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    c = e.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"), "event_id"
    )
    w = Window.orderBy("cents", "event_id")
    r = c.select(
        "cents",
        F.row_number().over(w).alias("i"),
        F.ntile(10).over(w).alias("decile"),
    )
    t = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("iws"),
    )
    dec = r.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("mass"),
    )
    n = F.col("n").cast("double")
    gini = (
        2.0 * F.col("iws").cast("double") / (n * F.col("s"))
        - (n + 1) / F.col("n")
    )
    return dec.crossJoin(F.broadcast(t)).select(
        "decile",
        "n_rows",
        "mass",
        (F.round(F.col("mass").cast("double") / F.col("s"), 6) + 0).alias(
            "mass_share"
        ),
        (F.round(gini, 6) + 0).alias("gini"),
    )


# --- flagship composite: end-to-end SQL-native text classifier --------------


@register(
    "ml_text_classifier_e2e",
    """
    WITH feat AS (
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             CAST(length(text) AS DOUBLE)
               / len(list_filter(string_split(text, ' '), w -> w <> '')) AS f1,
             CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                        w -> w <> ''))) AS DOUBLE)
               / len(list_filter(string_split(text, ' '), w -> w <> '')) AS f2
      FROM documents
      WHERE length(text) > 0
        AND len(list_filter(string_split(text, ' '), w -> w <> '')) > 0
    ),
    stats AS (
      SELECT round(avg(f1), 9) AS m1, round(stddev_pop(f1), 9) AS s1,
             round(avg(f2), 9) AS m2, round(stddev_pop(f2), 9) AS s2,
             CAST(count(*) AS DOUBLE) AS n
      FROM feat
    ),
    d AS (
      SELECT y, (f1 - m1) / s1 AS x1, (f2 - m2) / s2 AS x2, n
      FROM feat CROSS JOIN stats
    ),
    g1 AS (
      SELECT round(sum(0.5 - y) / max(n), 9) AS g0,
             round(sum((0.5 - y) * x1) / max(n), 9) AS ga,
             round(sum((0.5 - y) * x2) / max(n), 9) AS gb
      FROM d
    ),
    w1 AS (SELECT -0.5 * g0 AS w0, -0.5 * ga AS wa, -0.5 * gb AS wb FROM g1),
    g2 AS (
      SELECT round(sum(1.0/(1.0 + exp(-(w0 + wa*x1 + wb*x2))) - y) / max(n), 9) AS g0,
             round(sum((1.0/(1.0 + exp(-(w0 + wa*x1 + wb*x2))) - y) * x1) / max(n), 9) AS ga,
             round(sum((1.0/(1.0 + exp(-(w0 + wa*x1 + wb*x2))) - y) * x2) / max(n), 9) AS gb
      FROM d CROSS JOIN w1
    ),
    w2 AS (SELECT w0 - 0.5 * g0 AS w0, wa - 0.5 * ga AS wa, wb - 0.5 * gb AS wb
           FROM w1 CROSS JOIN g2),
    g3 AS (
      SELECT round(sum(1.0/(1.0 + exp(-(w0 + wa*x1 + wb*x2))) - y) / max(n), 9) AS g0,
             round(sum((1.0/(1.0 + exp(-(w0 + wa*x1 + wb*x2))) - y) * x1) / max(n), 9) AS ga,
             round(sum((1.0/(1.0 + exp(-(w0 + wa*x1 + wb*x2))) - y) * x2) / max(n), 9) AS gb
      FROM d CROSS JOIN w2
    ),
    w3 AS (SELECT w0 - 0.5 * g0 AS w0, wa - 0.5 * ga AS wa, wb - 0.5 * gb AS wb
           FROM w2 CROSS JOIN g3),
    pred AS (
      SELECT CAST(sum(CASE WHEN round(w0 + wa*x1 + wb*x2, 9) > 0
                            AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN round(w0 + wa*x1 + wb*x2, 9) > 0
                            AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT (round(w0 + wa*x1 + wb*x2, 9) > 0)
                            AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM d CROSS JOIN w3
    )
    SELECT round(w0, 6) + 0 AS w_intercept,
           round(wa, 6) + 0 AS w_chars_per_word,
           round(wb, 6) + 0 AS w_distinct_ratio,
           tp, fp, fn, n_rows
    FROM w3 CROSS JOIN pred
    """,
)
def ml_text_classifier_e2e(spark, sf_dir):
    """END-TO-END SQL-native text classifier: featurize raw documents
    (chars-per-word, distinct-word ratio — both exact-integer-derived
    doubles; the synthetic corpus shares an ASCII vocabulary across
    langs, so the model demonstrates the LOOP's cross-engine parity,
    not linguistic skill), standardize, train logistic regression by 3
    full-batch GD steps, and score (TP/FP/FN at the logit-sign
    threshold) — the whole train/evaluate loop as ONE lazy plan,
    the composite flagship tying llm_language_id's heuristic to
    ml_logistic_regression_gd's optimizer machinery. Float parity per
    the established discipline: stats and gradients rounded 1e-9 so
    both engines walk the identical weight trajectory; the prediction
    threshold is the logit sign (never exp). Scale shape: the
    featurization is narrow string arithmetic fused into each GD
    scan's projection (at 100 TB you cache the standardized (y, x1,
    x2) projection once); each step is one partial-aggregable 1-row
    gradient + broadcast weight join. Reference analog: the offline
    sklearn classifiers (M3) as in-engine relational algebra."""
    wn = F.size(F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
    d0 = _t(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & (wn > 0)
    )
    feat = d0.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.length("text").cast("double") / wn).alias("f1"),
        (
            F.size(
                F.array_distinct(
                    F.filter(F.split(F.col("text"), " "), lambda w: w != "")
                )
            ).cast("double")
            / wn
        ).alias("f2"),
    )
    stats = feat.agg(
        F.round(F.avg("f1"), 9).alias("m1"),
        F.round(F.stddev_pop("f1"), 9).alias("s1"),
        F.round(F.avg("f2"), 9).alias("m2"),
        F.round(F.stddev_pop("f2"), 9).alias("s2"),
        F.count("*").cast("double").alias("n"),
    )
    d = feat.crossJoin(F.broadcast(stats)).select(
        "y",
        ((F.col("f1") - F.col("m1")) / F.col("s1")).alias("x1"),
        ((F.col("f2") - F.col("m2")) / F.col("s2")).alias("x2"),
        "n",
    )
    g = d.agg(
        F.round(F.sum(F.lit(0.5) - F.col("y")) / F.max("n"), 9).alias("g0"),
        F.round(F.sum((F.lit(0.5) - F.col("y")) * F.col("x1")) / F.max("n"), 9).alias("ga"),
        F.round(F.sum((F.lit(0.5) - F.col("y")) * F.col("x2")) / F.max("n"), 9).alias("gb"),
    )
    w = g.select(
        (F.lit(-0.5) * F.col("g0")).alias("w0"),
        (F.lit(-0.5) * F.col("ga")).alias("wa"),
        (F.lit(-0.5) * F.col("gb")).alias("wb"),
    )
    for _ in range(2):
        dd = d.crossJoin(F.broadcast(w))
        z = F.col("w0") + F.col("wa") * F.col("x1") + F.col("wb") * F.col("x2")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = dd.agg(
            F.round(F.sum(p - F.col("y")) / F.max("n"), 9).alias("g0"),
            F.round(F.sum((p - F.col("y")) * F.col("x1")) / F.max("n"), 9).alias("ga"),
            F.round(F.sum((p - F.col("y")) * F.col("x2")) / F.max("n"), 9).alias("gb"),
            F.first("w0").alias("pw0"),
            F.first("wa").alias("pwa"),
            F.first("wb").alias("pwb"),
        )
        w = g.select(
            (F.col("pw0") - F.lit(0.5) * F.col("g0")).alias("w0"),
            (F.col("pwa") - F.lit(0.5) * F.col("ga")).alias("wa"),
            (F.col("pwb") - F.lit(0.5) * F.col("gb")).alias("wb"),
        )
    dd = d.crossJoin(F.broadcast(w))
    z = F.round(
        F.col("w0") + F.col("wa") * F.col("x1") + F.col("wb") * F.col("x2"), 9
    )
    pos = z > 0
    pred = dd.agg(
        F.sum(F.when(pos & (F.col("y") == 1.0), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(pos & (F.col("y") == 0.0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~pos & (F.col("y") == 1.0), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    zero = F.lit(0.0)
    return w.crossJoin(pred).select(
        (F.round(F.col("w0"), 6) + zero).alias("w_intercept"),
        (F.round(F.col("wa"), 6) + zero).alias("w_chars_per_word"),
        (F.round(F.col("wb"), 6) + zero).alias("w_distinct_ratio"),
        "tp",
        "fp",
        "fn",
        "n_rows",
    )


# --- sequence modeling: first-order Markov transition matrix -----------------


@register(
    "ml_markov_transition_matrix",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    t AS (
      SELECT event_type AS from_state, nxt AS to_state,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS n_from
            FROM t GROUP BY from_state)
    SELECT t.from_state, t.to_state, t.n,
           round(CAST(t.n AS DOUBLE) / n_from, 6) + 0 AS p
    FROM t JOIN tot USING (from_state)
    """,
)
def ml_markov_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over each user's
    time-ordered event sequence — P(next event type | current), the
    behavioral-model primitive behind next-action prediction and
    anomalous-session scoring. One user-keyed window (total order
    pinned by (ts, event_id)) emits the transitions, then two
    partial-aggregable counts; probabilities are single divisions of
    exact integers rounded 1e-6. Scale shape: the transition count
    table is |states|^2 (25 cells here) regardless of data volume —
    everything after the lead() window is sketch-sized. Reference
    analog: none (its session analysis stops at counts)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    t = o.groupBy(
        F.col("event_type").alias("from_state"), F.col("nxt").alias("to_state")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = t.groupBy("from_state").agg(F.sum("n").cast("long").alias("n_from"))
    return t.join(tot, "from_state").select(
        "from_state",
        "to_state",
        "n",
        (F.round(F.col("n").cast("double") / F.col("n_from"), 6) + 0).alias("p"),
    )


# --- information theory: mutual information ----------------------------------


@register(
    "ml_mutual_information",
    """
    WITH b AS (
      SELECT event_type AS xv,
             CAST(round(value * 100) AS BIGINT) // 5000 AS yv
      FROM events
    ),
    jnt AS (SELECT xv, yv, CAST(count(*) AS BIGINT) AS nxy FROM b GROUP BY 1, 2),
    mx  AS (SELECT xv, CAST(sum(nxy) AS BIGINT) AS nx FROM jnt GROUP BY xv),
    my  AS (SELECT yv, CAST(sum(nxy) AS BIGINT) AS ny FROM jnt GROUP BY yv),
    tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM jnt)
    SELECT round(sum(CAST(nxy AS DOUBLE) / n
                     * ln(CAST(nxy AS DOUBLE) * n
                          / (CAST(nx AS DOUBLE) * ny))), 6) + 0
             AS mutual_information_nats,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(max(n) AS BIGINT) AS n_rows
    FROM jnt JOIN mx USING (xv) JOIN my USING (yv) CROSS JOIN tot
    """,
)
def ml_mutual_information(spark, sf_dir):
    """Mutual information (nats) between the event type and the
    banded value — the nonlinear-dependence screen that catches what
    Pearson/Spearman miss (feature selection, leakage detection). The
    contingency table comes from ONE partial-aggregable groupBy
    (|X| x |Y| cells — sketch-sized at any data volume); margins and
    the total derive from the CELLS, never a second scan. The MI sum
    runs over exact integer counts with one ln() per cell, rounded
    1e-6 (the llm_char_entropy libm discipline: identical integer
    inputs -> same-to-ulp logs on both engines, far inside the
    rounding grid). Reference analog: none."""
    e = _t(spark, sf_dir, "events")
    b = e.select(
        F.col("event_type").alias("xv"),
        F.expr("CAST(round(value * 100) AS BIGINT) div 5000").alias("yv"),
    )
    jnt = b.groupBy("xv", "yv").agg(F.count(F.lit(1)).cast("long").alias("nxy"))
    mx = jnt.groupBy("xv").agg(F.sum("nxy").cast("long").alias("nx"))
    my = jnt.groupBy("yv").agg(F.sum("nxy").cast("long").alias("ny"))
    tot = jnt.agg(F.sum("nxy").cast("long").alias("n"))
    j = (
        jnt.join(mx, "xv")
        .join(my, "yv")
        .crossJoin(F.broadcast(tot))
    )
    term = (
        F.col("nxy").cast("double")
        / F.col("n")
        * F.log(
            F.col("nxy").cast("double")
            * F.col("n")
            / (F.col("nx").cast("double") * F.col("ny"))
        )
    )
    return j.agg(
        (F.round(F.sum(term), 6) + 0).alias("mutual_information_nats"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.max("n").cast("long").alias("n_rows"),
    )


# --- sequence pattern matching: V-shape detection -----------------------------


@register(
    "ext_sequence_pattern_vshape",
    """
    WITH o AS (
      SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS c,
             lag(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
             lag(CAST(round(value * 100) AS BIGINT), 2)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_vshapes,
           CAST(min(event_id) AS BIGINT) AS first_v_event,
           CAST(sum(c - p1) AS BIGINT) AS total_rebound_cents
    FROM o
    WHERE p2 IS NOT NULL AND p1 < p2 AND c > p1
    GROUP BY user_id
    """,
)
def ext_sequence_pattern_vshape(spark, sf_dir):
    """Row-pattern matching (the MATCH_RECOGNIZE family Spark lacks):
    detect V-shapes — a strict drop followed by a rebound — in each
    user's time-ordered value sequence, reporting per-user pattern
    counts and rebound mass. Fixed-length patterns compile to pure
    lag() windows (one user-keyed sort, zero joins, zero explode);
    variable-length patterns would extend this with the
    gaps-and-islands machinery (ext_gap_islands). All comparisons run
    on exact integer cents with a (ts, event_id) total order, so the
    match set is engine-exact. Scale shape: one window pass over the
    fact table, then a partial-aggregable per-user rollup. Reference
    analog: none (the classic FINRA/trade-surveillance query)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = F.round(F.col("value") * 100).cast("long")
    o = e.select(
        "user_id",
        "event_id",
        c.alias("c"),
        F.lag(c).over(w).alias("p1"),
        F.lag(c, 2).over(w).alias("p2"),
    )
    hits = o.filter(
        F.col("p2").isNotNull() & (F.col("p1") < F.col("p2")) & (F.col("c") > F.col("p1"))
    )
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vshapes"),
        F.min("event_id").cast("long").alias("first_v_event"),
        F.sum(F.col("c") - F.col("p1")).cast("long").alias("total_rebound_cents"),
    )
