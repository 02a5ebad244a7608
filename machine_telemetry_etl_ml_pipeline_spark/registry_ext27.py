"""Twenty-seventh extension batch (round 6, part 12): sequential
testing, robust statistics, operational telemetry, RLHF-style
preference mining, and blocked entity resolution.

- `ml_sprt_stopping`: Wald's Sequential Probability Ratio Test over
  the time-ordered urgent-order stream — the always-valid sequential
  A/B machinery (stop the first row the log-likelihood ratio leaves
  the (B, A) band). The LLR slope constants are Python-computed
  double literals injected into BOTH engines, so every per-row LLR
  is an identical IEEE expression over exact integer running counts.
- `ml_winsorized_mean`: 5/95-winsorized mean of order cents — clamp
  bounds are floor()ed percentile doubles (the proven Spark
  percentile == DuckDB quantile_cont pair, made integer before
  touching data), so clamped values stay EXACT integer cents and the
  robust mean is one division.
- `ext_interarrival_stats`: per-event-type inter-arrival times (lag
  under the total (ts, event_id) order, exact integer microseconds)
  with min/max/mean and interpolated p50 — the ops-telemetry rollup.
- `llm_preference_pairs`: per-source (chosen, rejected) document
  pairs by the composite quality grid with a minimum margin — the
  deterministic preference-data miner for RLHF/DPO-style training.
- `ext_entity_blocking_fuzzy`: blocked entity resolution on part
  names — block on the trailing noun, Levenshtein within blocks
  only, so the pair space is adjective^2-bounded per block, never
  row^2 (THE scale trick of record linkage).

Determinism contract: integer running counts / cents / micros
everywhere; the only doubles are injected-literal LLR slopes,
floor()ed-before-use percentile bounds, grid quality scores (4dp),
and single end divisions. Reference analog: none (extends the
experimentation / robust-stats / ops / training-prep / linkage
families)."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register
from .llm import textstats as ts

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# SPRT design: H0 p=0.35 vs H1 p=0.45, alpha = beta = 0.05.
_P0, _P1 = 0.35, 0.45
# Python-computed constants injected into BOTH engines: the per-row
# LLR is then pure multiply/add of identical doubles — no libm ln()
# call in either engine, so no cross-engine ulp risk at the boundary.
# CAST(<17-digit repr> AS DOUBLE) round-trips the exact float in both
# engines (bare decimal literals would parse as DECIMAL in both).
_LA_F = math.log(_P1 / _P0)
_LB_F = math.log((1 - _P1) / (1 - _P0))
_UPPER_F = math.log((1 - 0.05) / 0.05)
_LOWER_F = math.log(0.05 / (1 - 0.05))
_LA = f"CAST({_LA_F!r} AS DOUBLE)"
_LB = f"CAST({_LB_F!r} AS DOUBLE)"
_UPPER = f"CAST({_UPPER_F!r} AS DOUBLE)"
_LOWER = f"CAST({_LOWER_F!r} AS DOUBLE)"


@register(
    "ml_sprt_stopping",
    f"""
    WITH stream AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS x,
             row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    walk AS (
      SELECT rn,
             sum(x) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k
      FROM stream
    ),
    llr AS (
      SELECT rn, k,
             k * ({_LA}) + (rn - k) * ({_LB}) AS llr
      FROM walk
    ),
    crossers AS (
      SELECT 0 AS prio, rn, k, llr,
             CASE WHEN llr >= ({_UPPER}) THEN 'accept_h1'
                  ELSE 'accept_h0' END AS decision
      FROM llr WHERE llr >= ({_UPPER}) OR llr <= ({_LOWER})
    ),
    fallback AS (
      SELECT 1 AS prio, rn, k, llr, 'no_decision' AS decision
      FROM llr ORDER BY rn DESC LIMIT 1
    ),
    pick AS (
      SELECT * FROM (SELECT * FROM crossers UNION ALL SELECT * FROM fallback)
      ORDER BY prio, rn LIMIT 1
    )
    SELECT decision, CAST(rn AS BIGINT) AS stop_n, CAST(k AS BIGINT) AS k_at_stop,
           llr AS llr_at_stop
    FROM pick
    """,
)
def ml_sprt_stopping(spark, sf_dir):
    """Wald's SPRT over the time-ordered urgent-order stream (H0
    p=0.35 vs H1 p=0.45, alpha=beta=0.05): stop at the FIRST row
    whose LLR leaves the (ln(1/19), ln(19)) band — the always-valid
    sequential test an experimentation platform runs instead of
    fixed-horizon peeking. Exactness: the running success count k is
    an exact integer window sum under the total (orderdate, orderkey)
    order; the LLR slopes are PYTHON-computed double literals
    injected into both engines' SQL (no libm ln() at query time), so
    llr = k*a + (n-k)*b is a bitwise-identical IEEE expression and
    the first-crossing argmin (prio, rn) is total-ordered. Scale: one
    global-ordered running sum (range-partitioned sort at 100 TB) +
    a TakeOrdered(1). Reference analog: none (sequential upgrade of
    ml_ab_ztest_conversion)."""
    stream = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("x"),
        F.row_number()
        .over(Window.orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    walk = stream.select(
        "rn",
        F.sum("x")
        .over(
            Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("k"),
    )
    llr = walk.select(
        "rn",
        "k",
        (
            F.col("k") * F.expr(_LA) + (F.col("rn") - F.col("k")) * F.expr(_LB)
        ).alias("llr"),
    )
    crossers = llr.where(
        (F.col("llr") >= F.expr(_UPPER)) | (F.col("llr") <= F.expr(_LOWER))
    ).select(
        F.lit(0).alias("prio"),
        "rn",
        "k",
        "llr",
        F.when(F.col("llr") >= F.expr(_UPPER), "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )
    fallback = (
        llr.orderBy(F.desc("rn"))
        .limit(1)
        .select(
            F.lit(1).alias("prio"), "rn", "k", "llr", F.lit("no_decision").alias("decision")
        )
    )
    return (
        crossers.unionAll(fallback)
        .orderBy("prio", "rn")
        .limit(1)
        .select(
            "decision",
            F.col("rn").cast("long").alias("stop_n"),
            F.col("k").cast("long").alias("k_at_stop"),
            F.col("llr").alias("llr_at_stop"),
        )
    )


@register(
    "ml_winsorized_mean",
    f"""
    WITH c AS (
      SELECT {_CENTS.format(col="o_totalprice")} AS cents FROM orders
    ),
    bounds AS (
      SELECT CAST(floor(quantile_cont(cents, 0.05)) AS BIGINT) AS lo,
             CAST(floor(quantile_cont(cents, 0.95)) AS BIGINT) AS hi
      FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high,
           CAST(sum(greatest(lo, least(hi, cents))) AS BIGINT)
             AS winsorized_cents,
           CAST(sum(greatest(lo, least(hi, cents))) AS DOUBLE) / count(*)
             AS winsorized_mean_cents
    FROM c CROSS JOIN bounds
    """,
)
def ml_winsorized_mean(spark, sf_dir):
    """5/95-winsorized mean of order cents — the outlier-robust center
    estimate (clamp, don't drop — unlike a trimmed mean the sample
    size is preserved). Exactness: the percentile bounds ride the
    proven Spark percentile == DuckDB quantile_cont interpolation
    pair and are floor()ed to integer cents BEFORE touching data
    (floor of a bitwise-identical double is safe), so every clamped
    value is an exact integer, the winsorized sum is exact, and the
    mean is ONE division. Scale: one percentile pass + one clamp-sum
    pass, both partial-aggregable; bounds ride a 1-row broadcast.
    Reference analog: none (robust companion to ref_stats_global /
    ext_mad_outliers)."""
    c = _t(spark, sf_dir, "orders").select(
        F.expr(_CENTS.format(col="o_totalprice")).alias("cents")
    )
    bounds = c.agg(
        F.floor(F.expr("percentile(cents, 0.05)")).cast("long").alias("lo"),
        F.floor(F.expr("percentile(cents, 0.95)")).cast("long").alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("cents")))
    return c.crossJoin(F.broadcast(bounds)).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_low"),
        F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_high"),
        F.sum(clamped).cast("long").alias("winsorized_cents"),
        (F.sum(clamped).cast("double") / F.count("*")).alias("winsorized_mean_cents"),
    )


@register(
    "ext_interarrival_stats",
    """
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_us,
           CAST(max(gap_us) AS BIGINT) AS max_us,
           CAST(sum(gap_us) AS DOUBLE) / count(gap_us) AS mean_us,
           quantile_cont(gap_us, 0.5) AS p50_us
    FROM seq WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def ext_interarrival_stats(spark, sf_dir):
    """Per-event-type inter-arrival statistics: consecutive gaps under
    the total (ts, event_id) order as EXACT integer microseconds
    (epoch_us both engines — the micros doctrine), with min/max/mean
    and the interpolated median (the percentile == quantile_cont
    pair). The arrival-rate telemetry every ops dashboard needs; gaps
    are also the inputs to exponential burn-rate alerting. Scale: one
    window pass partitioned by type, then a partial-aggregable
    rollup (the median is per-type, bounded groups). Reference
    analog: the reference's time-feature derivation
    (project/db.py:330-360) extracts calendar fields; this extracts
    the process dynamics."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pus = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ -> micros
    seq = ev.select(
        "event_type",
        (pus - F.lag(pus).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.min("gap_us").cast("long").alias("min_us"),
            F.max("gap_us").cast("long").alias("max_us"),
            (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("mean_us"),
            F.expr("percentile(gap_us, 0.5)").alias("p50_us"),
        )
        .orderBy("event_type")
    )


_QUALITY_SQL = """
      SELECT doc_id, source,
             round((CASE WHEN n_tokens >= 20 THEN 0.4::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10
                         THEN 0.3::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN n_punct / n_chars_calc <= 0.1
                         THEN 0.2::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN n_stop > 0 THEN 0.1::DOUBLE ELSE 0.0 END), 4) AS q
      FROM (
        SELECT doc_id, source,
               length(text) AS n_chars_calc,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]',
                                                    '', 'g')) AS n_punct,
               length(replace(text, ' ', ''))
                 / len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS mean_word_len,
               len(list_intersect(list_filter(string_split(text, ' '),
                                              x -> x <> ''), {stops}))
                 AS n_stop
        FROM documents
      )
"""


@register(
    "llm_preference_pairs",
    f"""
    WITH scored AS ({_QUALITY_SQL.format(
        stops="[" + ", ".join(f"'{w}'" for w in ts.STOPWORDS["en"]) + "]"
    )}),
    ranked AS (
      SELECT source, doc_id, q,
             row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id)
               AS rn_best,
             row_number() OVER (PARTITION BY source ORDER BY q ASC, doc_id)
               AS rn_worst
      FROM scored
    )
    SELECT b.source,
           b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
           b.q AS q_chosen, w.q AS q_rejected,
           round(b.q - w.q, 4) AS margin
    FROM (SELECT * FROM ranked WHERE rn_best = 1) b
    JOIN (SELECT * FROM ranked WHERE rn_worst = 1) w ON b.source = w.source
    WHERE round(b.q - w.q, 4) >= 0.3
    ORDER BY b.source
    """,
)
def llm_preference_pairs(spark, sf_dir):
    """Per-source (chosen, rejected) preference pairs by the composite
    quality grid — deterministic preference-data mining for RLHF/DPO
    training: within each source the best and worst documents under
    the TOTAL (quality, doc_id) order form a pair, kept only when the
    quality margin >= 0.3 (pairs too close to call are noise, the
    standard preference-mining filter). Quality rides the established
    4dp grid (llm_quality_score), so ranks and the margin filter are
    grid-exact cross-engine. Scale: one scoring scan + two per-source
    window top-1s (group-bounded), no pairwise anything. Reference
    analog: none (extends llm_quality_score / llm_dedup_keep_best
    toward preference training data)."""
    d = ts.with_quality_score(_t(spark, sf_dir, "documents"))
    scored = d.select("doc_id", "source", F.col("quality_score").alias("q"))
    wb = Window.partitionBy("source").orderBy(F.desc("q"), F.asc("doc_id"))
    ww = Window.partitionBy("source").orderBy(F.asc("q"), F.asc("doc_id"))
    ranked = scored.select(
        "source",
        "doc_id",
        "q",
        F.row_number().over(wb).alias("rn_best"),
        F.row_number().over(ww).alias("rn_worst"),
    )
    b = ranked.where(F.col("rn_best") == 1).select(
        "source", F.col("doc_id").alias("chosen_doc"), F.col("q").alias("q_chosen")
    )
    w = ranked.where(F.col("rn_worst") == 1).select(
        "source", F.col("doc_id").alias("rejected_doc"), F.col("q").alias("q_rejected")
    )
    return (
        b.join(w, "source")
        .withColumn("margin", F.round(F.col("q_chosen") - F.col("q_rejected"), 4))
        .where(F.col("margin") >= 0.3)
        .select(
            "source", "chosen_doc", "rejected_doc", "q_chosen", "q_rejected", "margin"
        )
        .orderBy("source")
    )


@register(
    "ext_entity_blocking_fuzzy",
    """
    WITH names AS (
      SELECT p_name AS name, regexp_extract(p_name, '([a-z]+)$', 1) AS block,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY p_name
    )
    SELECT a.block, a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.block = b.block AND a.name < b.name
     AND levenshtein(a.name, b.name) <= 5
    ORDER BY a.block, name_a, name_b
    """,
)
def ext_entity_blocking_fuzzy(spark, sf_dir):
    """Blocked entity resolution on part names: block on the trailing
    noun (regexp_extract — same function and RE2-safe pattern both
    engines), compare with Levenshtein ONLY within blocks, keep pairs
    at edit distance <= 5 — the record-linkage architecture where
    blocking turns an O(n^2) similarity join into per-block
    adjective^2 work on the DISTINCT name dimension (the
    ext_fuzzy_levenshtein doctrine: dedupe the dim first, fuzzy-join
    the tiny distinct sets, never edit-distance over fact rows).
    All-integer outputs. Scale: the name dimension is
    vocabulary-bounded; blocks broadcast. Reference analog: none
    (extends ext_fuzzy_levenshtein with the blocking stage)."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").cast("long").alias("n_parts"))
        .withColumn("block", F.regexp_extract(F.col("name"), "([a-z]+)$", 1))
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name"))
            & (dist <= 5),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.cast("long").alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
        .orderBy("block", "name_a", "name_b")
    )
