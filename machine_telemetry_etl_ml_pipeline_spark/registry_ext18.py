"""Eighteenth extension batch (round 6, part 3): time-series resampling
and the remaining classical evaluation / association statistics.

- `ext_resample_ohlc`: open/high/low/close resampling of the purchase
  value stream into hourly bars — the canonical time-series
  downsampling operator (financial bars, telemetry rollups). One
  shuffle on the hour bucket; open/close ride a single row_number +
  count window pair over the SAME sort, so Spark performs one sort per
  bucket, not two.
- `ext_interpolate_linear`: gap-filling LINEAR interpolation on an
  hourly spine (sequence/generate_series) — the step beyond
  ext_gap_fill_ffill: interior missing hours get the time-weighted
  line between neighbors, computed as an all-integer truncating
  division (verified: Spark `div` and DuckDB `//` both truncate toward
  zero, incl. negatives).
- `ml_average_precision`: exact PR-AUC (step-wise average precision,
  the sklearn `average_precision_score` definition) for the length
  score predicting lang='en' — the imbalanced-class companion to
  ml_roc_auc. Threshold table is |distinct scores|-bounded; the float
  sum rides the sequential-fold doctrine (identical op tree both
  engines, shipped unrounded).
- `ml_cohens_kappa`: inter-rater agreement between two deterministic
  document-quality raters, chance-corrected. The whole statistic
  reduces to ONE integer-ratio division: kappa = (N*agree - S) /
  (N^2 - S) with S = sum of marginal products — no float
  accumulation anywhere.
- `ml_cramers_v`: Cramer's V effect size for order-priority x
  order-status association — the bounded-contingency chi-square
  (ml_chi_square_assoc) upgraded to the sequential-fold exactness
  bar: cell terms are folded in pinned (row,col) order so chi2 and V
  ship UNROUNDED and match bitwise.

Determinism contract: every aggregate that touches data volume is an
exact integer (cents via floor(x*100+0.5), counts, marginal
products); the only doubles are sequential folds over
category/calendar-bounded tables and single fixed IEEE formulas over
exact integers. Reference analog: none (all beyond the reference's
surface; cited per-entry where a family exists)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register

# Exact half-up cents from a double value — the per-row-cents doctrine
# (see tpch_q19 / ext_join_theta): floor(x*100 + 0.5) is the same single
# IEEE expression on both engines, and every aggregate after it is BIGINT.
# (A function, not a module constant: F.expr needs an active session.)
_CENTS_SQL = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


def _cents():
    return F.expr(_CENTS_SQL)


# --- OHLC resampling ---------------------------------------------------------


@register(
    "ext_resample_ohlc",
    f"""
    WITH px AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bar_t,
             {_CENTS_SQL} AS cents, ts, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    rn AS (
      SELECT bar_t, cents,
             row_number() OVER (PARTITION BY bar_t ORDER BY ts, event_id) AS r,
             count(*) OVER (PARTITION BY bar_t) AS c
      FROM px
    )
    SELECT bar_t,
           max(CASE WHEN r = 1 THEN cents END) AS open_cents,
           max(cents) AS high_cents,
           min(cents) AS low_cents,
           max(CASE WHEN r = c THEN cents END) AS close_cents,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS vol_cents
    FROM rn GROUP BY bar_t
    """,
)
def ext_resample_ohlc(spark, sf_dir):
    """Hourly OHLC (open/high/low/close) bars over the purchase value
    stream — the canonical downsampling operator for tick/telemetry
    data. Open/close need a total per-bar event order: (ts, event_id)
    is the unique tiebreak (two-pass-window doctrine), and both rank
    and count ride ONE window partition/sort, so the plan is a single
    hash shuffle on bar_t plus one sort — no second exchange.
    Exactness: values become half-up cents BEFORE any aggregation
    (floor(v*100+0.5), identical IEEE expression both engines), so
    open/high/low/close/volume are all BIGINT — no float order
    sensitivity at any partitioning. Scale shape: shuffle keyed on the
    hour bucket (dense, non-skewed); output is calendar-bounded.
    Reference analog: the reference's pandas resample-style rollups in
    project/database_and_model_tools.py:95-130 (hourly aggregates)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    px = e.select(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
        .cast("long")
        .alias("bar_t"),
        _cents().alias("cents"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("bar_t").orderBy("ts", "event_id")
    wc = Window.partitionBy("bar_t")
    rn = px.select(
        "bar_t",
        "cents",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wc).alias("c"),
    )
    return rn.groupBy("bar_t").agg(
        F.max(F.when(F.col("r") == 1, F.col("cents"))).alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.when(F.col("r") == F.col("c"), F.col("cents"))).alias(
            "close_cents"
        ),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("vol_cents"),
    )


# --- linear interpolation on an hourly spine ---------------------------------


@register(
    "ext_interpolate_linear",
    f"""
    WITH sparse AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS t,
             CAST(sum({_CENTS_SQL}) AS BIGINT) AS obs_cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    bounds AS (SELECT min(t) AS lo, max(t) AS hi FROM sparse),
    spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS t FROM bounds),
    j AS (
      SELECT spine.t, sparse.obs_cents FROM spine
      LEFT JOIN sparse ON spine.t = sparse.t
    ),
    nb AS (
      SELECT t, obs_cents,
             last_value(obs_cents IGNORE NULLS) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
             last_value(CASE WHEN obs_cents IS NOT NULL THEN t END
               IGNORE NULLS) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(obs_cents IGNORE NULLS) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
             first_value(CASE WHEN obs_cents IS NOT NULL THEN t END
               IGNORE NULLS) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    )
    SELECT t, obs_cents,
           CASE WHEN obs_cents IS NOT NULL THEN obs_cents
                ELSE pc + ((nc - pc) * (t - pt)) // (nt - pt)
           END AS filled_cents
    FROM nb
    """,
)
def ext_interpolate_linear(spark, sf_dir):
    """Linear (time-weighted) interpolation of interior gaps in the
    hourly purchase-cents series, on an explicit hour spine built with
    sequence()/generate_series — the gap-fill operator beyond
    ext_gap_fill_ffill's step-carry: missing hours get the straight
    line between the previous and next observed hours. Exactness: the
    sparse series is an exact BIGINT cents sum; the interpolant is an
    all-integer expression pc + ((nc-pc)*(t-pt)) div (nt-pt), and
    Spark's `div` and DuckDB's `//` BOTH truncate toward zero
    (verified incl. negative numerators), so no float enters the
    query at all. Scale shape: one partial-aggregable groupBy(hour)
    collapses the stream to a calendar-bounded series; the spine and
    all four IGNORE-NULLS neighbor windows run on that bounded table
    (single-partition total order is safe there — the doctrine used by
    every calendar-bounded window in this registry). Reference analog:
    pandas interpolate(method='linear') in the reference's feature
    prep (project/database_and_model_tools.py:95-130 family)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    sparse = (
        e.select(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            .cast("long")
            .alias("t"),
            _cents().alias("cents"),
        )
        .groupBy("t")
        .agg(F.sum("cents").cast("long").alias("obs_cents"))
    )
    bounds = sparse.agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("t")
    )
    j = spine.join(sparse, "t", "left")
    wp = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    t_if_obs = F.when(F.col("obs_cents").isNotNull(), F.col("t"))
    nb = j.select(
        "t",
        "obs_cents",
        F.last("obs_cents", ignorenulls=True).over(wp).alias("pc"),
        F.last(t_if_obs, ignorenulls=True).over(wp).alias("pt"),
        F.first("obs_cents", ignorenulls=True).over(wn).alias("nc"),
        F.first(t_if_obs, ignorenulls=True).over(wn).alias("nt"),
    )
    filled = F.when(F.col("obs_cents").isNotNull(), F.col("obs_cents")).otherwise(
        F.col("pc")
        + F.expr("((nc - pc) * (t - pt)) div (nt - pt)")
    )
    return nb.select("t", "obs_cents", filled.cast("long").alias("filled_cents"))


# --- average precision (PR-AUC) ----------------------------------------------


@register(
    "ml_average_precision",
    """
    WITH RECURSIVE g AS (
      SELECT n_chars AS score,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos_g,
             count(*) AS tot_g
      FROM documents GROUP BY n_chars
    ),
    tot AS (SELECT sum(pos_g) AS p FROM g),
    c AS (
      SELECT score, pos_g,
             sum(pos_g) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(tot_g) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctot
      FROM g
    ),
    steps AS (
      SELECT row_number() OVER (ORDER BY score DESC) AS rn,
             CAST(pos_g AS BIGINT) AS dtp, CAST(tp AS BIGINT) AS tp,
             CAST(ctot AS BIGINT) AS ctot
      FROM c WHERE pos_g > 0
    ),
    ns AS (SELECT count(*) AS n_steps FROM steps),
    fold AS (
      SELECT st.rn,
             CAST(st.dtp AS DOUBLE) * st.tp / (CAST(p AS DOUBLE) * st.ctot)
               AS ap
      FROM steps st CROSS JOIN tot WHERE st.rn = 1
      UNION ALL
      SELECT st.rn,
             f.ap + CAST(st.dtp AS DOUBLE) * st.tp
                    / (CAST(p AS DOUBLE) * st.ctot)
      FROM fold f JOIN steps st ON st.rn = f.rn + 1 CROSS JOIN tot
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n_steps AS BIGINT) AS n_thresholds,
           ap + 0 AS average_precision
    FROM fold CROSS JOIN tot CROSS JOIN ns
    WHERE rn = n_steps
    """,
)
def ml_average_precision(spark, sf_dir):
    """Exact average precision (step-wise PR-AUC, the sklearn
    `average_precision_score` definition: AP = sum_k (R_k - R_{k-1})
    * P_k over distinct thresholds descending) for the document-length
    score predicting lang='en' — the imbalanced-class ranking metric
    next to ml_roc_auc. The threshold table is |distinct
    scores|-bounded (one partial-aggregable groupBy collapses the
    corpus); TP/total cumulatives are exact BIGINTs from windows on
    that bounded table. The float SUM of per-threshold terms is the
    one order-sensitive op, so it rides the sequential-fold doctrine
    (ext_holt_linear / ml_kaplan_meier): Spark folds an rn-sorted
    array, DuckDB walks a recursive CTE — the identical add/mul/div
    tree in the identical order, shipped UNROUNDED. Scale shape: data
    volume is touched once by the groupBy; everything else is
    score-domain-bounded."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    g = d.groupBy("score").agg(
        F.sum("y").alias("pos_g"), F.count(F.lit(1)).alias("tot_g")
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.select(
        "score",
        "pos_g",
        F.sum("pos_g").over(w).cast("long").alias("tp"),
        F.sum("tot_g").over(w).cast("long").alias("ctot"),
    )
    steps = (
        c.filter(F.col("pos_g") > 0)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("score").desc()))
            .alias("rn"),
            F.col("pos_g").cast("long").alias("dtp"),
            "tp",
            "ctot",
        )
    )
    tot = g.agg(F.sum("pos_g").cast("long").alias("p"))
    folded = (
        steps.crossJoin(F.broadcast(tot))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "dtp", "tp", "ctot"))
            ).alias("s"),
            F.max("p").alias("p"),
        )
        .select(
            F.col("p"),
            F.size("s").cast("long").alias("n_steps"),
            F.expr(
                """
                aggregate(
                  s, CAST(0.0 AS DOUBLE),
                  (acc, e) -> acc + CAST(e.dtp AS DOUBLE) * e.tp
                              / (CAST(p AS DOUBLE) * e.ctot)
                ) AS ap
                """
            ),
        )
    )
    return folded.select(
        F.col("p").alias("n_pos"),
        F.col("n_steps").alias("n_thresholds"),
        (F.col("ap") + 0).alias("average_precision"),
    )


# --- Cohen's kappa -----------------------------------------------------------


@register(
    "ml_cohens_kappa",
    """
    WITH r AS (
      SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
             CASE WHEN length(text) - length(replace(text, ' ', '')) >= 49
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM r GROUP BY a, b),
    m AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = b THEN o ELSE 0 END) AS BIGINT) AS agree,
             CAST(sum(CASE WHEN a = 1 THEN o ELSE 0 END) AS BIGINT) AS ra1,
             CAST(sum(CASE WHEN b = 1 THEN o ELSE 0 END) AS BIGINT) AS rb1
      FROM cells
    )
    SELECT n, agree,
           CAST(n * agree - (ra1 * rb1 + (n - ra1) * (n - rb1)) AS DOUBLE)
             / CAST(n * n - (ra1 * rb1 + (n - ra1) * (n - rb1)) AS DOUBLE) + 0
             AS kappa
    FROM m
    """,
)
def ml_cohens_kappa(spark, sf_dir):
    """Cohen's kappa — chance-corrected agreement between two
    deterministic document-quality raters (rater A: n_chars >= 300;
    rater B: whitespace-delimited word count >= 50, i.e. >= 49
    separator spaces) — the annotation-QA statistic an LLM data
    pipeline computes over double-labeled slices. Algebra: kappa =
    (po - pe)/(1 - pe) multiplied through by N^2 gives
    (N*agree - S) / (N^2 - S) with S = ra1*rb1 + ra0*rb0 — ALL exact
    BIGINTs from one 4-cell contingency groupBy, so the statistic is
    a single integer-ratio IEEE division: no float accumulation, no
    rounding needed, bit-identical at any partitioning. Scale shape:
    one partial-aggregable pass; everything after runs on 4 rows."""
    r = _t(spark, sf_dir, "documents").select(
        (F.col("n_chars") >= 300).cast("int").alias("a"),
        (
            F.expr("length(text) - length(replace(text, ' ', ''))") >= 49
        )
        .cast("int")
        .alias("b"),
    )
    cells = r.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("o"))
    m = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("o")).otherwise(0))
        .cast("long")
        .alias("agree"),
        F.sum(F.when(F.col("a") == 1, F.col("o")).otherwise(0))
        .cast("long")
        .alias("ra1"),
        F.sum(F.when(F.col("b") == 1, F.col("o")).otherwise(0))
        .cast("long")
        .alias("rb1"),
    )
    s = F.col("ra1") * F.col("rb1") + (F.col("n") - F.col("ra1")) * (
        F.col("n") - F.col("rb1")
    )
    kappa = (
        (F.col("n") * F.col("agree") - s).cast("double")
        / (F.col("n") * F.col("n") - s).cast("double")
        + 0
    )
    return m.select("n", "agree", kappa.alias("kappa"))


# --- Cramer's V --------------------------------------------------------------


@register(
    "ml_cramers_v",
    """
    WITH RECURSIVE obs AS (
      SELECT o_orderpriority AS rk, o_orderstatus AS ck,
             CAST(count(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ),
    rm AS (SELECT rk, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY rk),
    cm AS (SELECT ck, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY ck),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_cells FROM obs),
    dims AS (SELECT (SELECT count(*) FROM rm) AS nr,
                    (SELECT count(*) FROM cm) AS nc),
    cells AS (
      SELECT row_number() OVER (ORDER BY obs.rk, obs.ck) AS rn, o, r, c
      FROM obs JOIN rm USING (rk) JOIN cm USING (ck)
    ),
    fold AS (
      SELECT rn,
             pow(o - CAST(r AS DOUBLE) * c / n, 2)
               / (CAST(r AS DOUBLE) * c / n) AS chi2
      FROM cells CROSS JOIN tot WHERE rn = 1
      UNION ALL
      SELECT cl.rn,
             f.chi2 + pow(cl.o - CAST(cl.r AS DOUBLE) * cl.c / n, 2)
                      / (CAST(cl.r AS DOUBLE) * cl.c / n)
      FROM fold f JOIN cells cl ON cl.rn = f.rn + 1 CROSS JOIN tot
    )
    SELECT n, chi2 + 0 AS chi2,
           sqrt(chi2 / (n * least(nr - 1, nc - 1))) + 0 AS cramers_v
    FROM fold CROSS JOIN tot CROSS JOIN dims
    WHERE rn = n_cells
    """,
)
def ml_cramers_v(spark, sf_dir):
    """Cramer's V effect size (chi-square normalized to [0,1]) for the
    order-priority x order-status association — the categorical
    feature-screening number a modeling pipeline reports next to the
    raw chi2 (ml_chi_square_assoc). Exactness upgrade over that entry:
    instead of rounding a float-accumulated chi2, the per-cell terms
    (o - rc/n)^2/(rc/n) — each a fixed IEEE tree over exact BIGINT
    margins — are summed in pinned (row-key, col-key) order via the
    sequential-fold doctrine (Spark: rn-sorted array aggregate();
    DuckDB: recursive CTE), so chi2 and V ship UNROUNDED and match
    bitwise. Scale shape: the contingency table is category-bounded
    (|priorities| x |statuses| cells); the only data-sized op is the
    first partial-aggregable groupBy."""
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("rk"),
        F.col("o_orderstatus").alias("ck"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rm = obs.groupBy("rk").agg(F.sum("o").cast("long").alias("r"))
    cm = obs.groupBy("ck").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    nr = rm.count()
    nc = cm.count()
    cells = (
        obs.join(F.broadcast(rm), "rk")
        .join(F.broadcast(cm), "ck")
        .select(
            F.row_number().over(Window.orderBy("rk", "ck")).alias("rn"),
            "o",
            "r",
            "c",
        )
    )
    folded = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.array_sort(F.collect_list(F.struct("rn", "o", "r", "c"))).alias(
                "s"
            ),
            F.max("n").alias("n"),
        )
        .select(
            "n",
            F.expr(
                """
                aggregate(
                  s, CAST(0.0 AS DOUBLE),
                  (acc, e) -> acc
                    + pow(e.o - CAST(e.r AS DOUBLE) * e.c / n, 2)
                      / (CAST(e.r AS DOUBLE) * e.c / n)
                ) AS chi2
                """
            ),
        )
    )
    k = F.lit(min(nr - 1, nc - 1))
    return folded.select(
        "n",
        (F.col("chi2") + 0).alias("chi2"),
        (F.sqrt(F.col("chi2") / (F.col("n") * k)) + 0).alias("cramers_v"),
    )
