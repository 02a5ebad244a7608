"""Twenty-eighth extension batch (round 6, part 13): seasonal
exponential smoothing, item-item collaborative filtering, corpus
budget allocation, and calendar-interval semantics.

- `ext_holt_winters_seasonal`: additive Holt-Winters (level + trend
  + weekly seasonality, alpha/beta/gamma fixed) over the daily
  purchase-cents series — the seasonal upgrade of ext_holt_linear.
  The recursion is a sequential fold over the CALENDAR-BOUNDED daily
  series (days, not rows — the same boundedness argument as
  ml_theil_sen_slope); every step is multiply/add only, so the
  smoothed state matches bitwise cross-engine.
- `ml_item_item_cosine`: item-item collaborative filtering — cosine
  similarity of parts over their co-buyer sets (n_ij /
  sqrt(n_i * n_j)), top-10 pairs on the 4dp grid — the classic
  neighborhood recommender next to ml_als_recommend. Pair
  generation is keyed per customer (bounded basket sizes), never
  all-pairs.
- `llm_token_budget_fill`: greedy token-budget allocation across
  sources in priority order (tokens-per-doc density) — the mixing
  step that fills a training budget from the densest sources first.
  One running prefix sum + integer clamp.
- `ext_interval_arithmetic`: calendar-interval semantics parity —
  add_months / + INTERVAL 3 MONTH with end-of-month clamping, both
  engines; exact epoch-day checksums.

Determinism contract: counts/cents/epoch-days exact integers;
Holt-Winters state is pure */+ IEEE chains; cosine rides the 4dp
grid with total tie orders. Reference analog: none (extends the
time-series / recsys / corpus-mixing / scalar-date families)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"
_ALPHA, _BETA, _GAMMA = 0.3, 0.1, 0.2
_M = 7  # weekly seasonality


def _hw_step_sql(lev: str, tr: str, s: list[str], y: str, idx: str) -> dict[str, str]:
    """One additive Holt-Winters update with every subterm inlined —
    identical op tree on both engines. The seasonal slot idx (= rn %
    7 BEFORE the update) is read for the level and rewritten."""
    s_old = (
        "(CASE " + " ".join(f"WHEN {idx} = {i} THEN {s[i]}" for i in range(_M)) + " END)"
    )
    lev_n = f"({_ALPHA} * ({y} - {s_old}) + {1 - _ALPHA} * ({lev} + {tr}))"
    tr_n = f"({_BETA} * ({lev_n} - {lev}) + {1 - _BETA} * {tr})"
    out = {"lev": lev_n, "tr": tr_n}
    for i in range(_M):
        out[f"s{i}"] = (
            f"(CASE WHEN {idx} = {i} THEN "
            f"({_GAMMA} * ({y} - {lev_n}) + {1 - _GAMMA} * {s_old}) "
            f"ELSE {s[i]} END)"
        )
    return out


def _hw_oracle() -> str:
    s_cols = [f"w.s{i}" for i in range(_M)]
    st = _hw_step_sql("w.lev", "w.tr", s_cols, "d.y", "(w.rn % 7)")
    s_select = ", ".join(st[f"s{i}"] + f" AS s{i}" for i in range(_M))
    s_final = ", ".join(f"s{i}" for i in range(_M))
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum({_CENTS.format(col="value")}) AS DOUBLE) AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY CAST(ts AS DATE)
    ),
    seq AS MATERIALIZED (
      SELECT y, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    n AS (SELECT max(rn) AS len FROM seq),
    walk(rn, lev, tr, s0, s1, s2, s3, s4, s5, s6) AS (
      -- rn = 1: the state AFTER consuming day 1 (level init), matching
      -- the Spark fold whose init consumes seq[0]
      SELECT 1, (SELECT y FROM seq WHERE rn = 1), CAST(0 AS DOUBLE),
             CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
             CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
             CAST(0 AS DOUBLE)
      UNION ALL
      SELECT w.rn + 1, {st["lev"]}, {st["tr"]}, {s_select}
      FROM walk w JOIN seq d ON d.rn = w.rn + 1
    ),
    fin AS (
      SELECT w.* FROM walk w JOIN n ON w.rn = n.len
    )
    SELECT CAST(rn AS BIGINT) AS n_days, lev AS level_, tr AS trend,
           {s_final},
           lev + tr + (CASE (rn % 7) WHEN 0 THEN s0 WHEN 1 THEN s1
             WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5
             ELSE s6 END) AS forecast_next
    FROM fin
    """


@register("ext_holt_winters_seasonal", _hw_oracle())
def ext_holt_winters_seasonal(spark, sf_dir):
    """Additive Holt-Winters (alpha=0.3, beta=0.1, gamma=0.2, weekly
    season) over the daily purchase-cents series. The fold walks the
    CALENDAR-BOUNDED day sequence (the series length grows with the
    date range, not the row count — the Theil-Sen boundedness
    argument), carrying (level, trend, s0..s6): Spark folds the
    sorted day array with F.aggregate, the oracle walks the identical
    recursion as a recursive CTE, and every update is multiply/add of
    doubles — no libm — so the state matches bitwise (the
    ml_hmm_forward doctrine). The seasonal slot is read at rn%7
    BEFORE the update and rewritten after, the same slot both
    engines. Output: final state + one-step forecast, unrounded.
    Scale: the daily rollup is one partial-aggregable groupBy; the
    fold is a 1-row array aggregate over <= days elements. Reference
    analog: none (seasonal upgrade of ext_holt_linear)."""
    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.expr(_CENTS.format(col="value"))).cast("double").alias("y"))
    )
    seqs = daily.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("seq")
    )
    s_cols = [f"acc.s{i}" for i in range(_M)]
    st = _hw_step_sql("acc.lev", "acc.tr", s_cols, "x.y", "(acc.i % 7)")
    named = ", ".join(
        ["'lev', " + st["lev"], "'tr', " + st["tr"]]
        + [f"'s{i}', " + st[f"s{i}"] for i in range(_M)]
        + ["'i', acc.i + 1"]
    )
    init_s = ", ".join(f"'s{i}', CAST(0 AS DOUBLE)" for i in range(_M))
    fold = F.expr(
        f"""
        aggregate(
          slice(seq, 2, size(seq) - 1),
          named_struct('lev', seq[0].y, 'tr', CAST(0 AS DOUBLE), {init_s},
                       'i', 1),
          (acc, x) -> named_struct({named})
        )
        """
    )
    fin = seqs.select(F.size("seq").alias("n_days_i"), fold.alias("st"))
    season_next = (
        "(CASE (st.i % 7) WHEN 0 THEN st.s0 WHEN 1 THEN st.s1 WHEN 2 THEN st.s2 "
        "WHEN 3 THEN st.s3 WHEN 4 THEN st.s4 WHEN 5 THEN st.s5 ELSE st.s6 END)"
    )
    return fin.select(
        F.col("n_days_i").cast("long").alias("n_days"),
        F.col("st.lev").alias("level_"),
        F.col("st.tr").alias("trend"),
        *[F.col(f"st.s{i}").alias(f"s{i}") for i in range(_M)],
        F.expr(f"st.lev + st.tr + {season_next}").alias("forecast_next"),
    )


@register(
    "ml_item_item_cosine",
    """
    WITH buyers AS (
      SELECT DISTINCT l.l_partkey AS part, o.o_custkey AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sz AS (SELECT part, CAST(count(*) AS BIGINT) AS n FROM buyers GROUP BY part),
    pairs AS (
      SELECT a.part AS i, b.part AS j, CAST(count(*) AS BIGINT) AS nij
      FROM buyers a JOIN buyers b ON a.cust = b.cust AND a.part < b.part
      GROUP BY a.part, b.part
    ),
    scored AS (
      SELECT p.i, p.j, p.nij, si.n AS ni, sj.n AS nj,
             round(CAST(p.nij AS DOUBLE)
                   / sqrt(CAST(si.n AS DOUBLE) * CAST(sj.n AS DOUBLE)), 4)
               AS cosine
      FROM pairs p JOIN sz si ON p.i = si.part JOIN sz sj ON p.j = sj.part
    )
    SELECT i, j, nij, ni, nj, cosine FROM scored
    ORDER BY cosine DESC, i, j LIMIT 10
    """,
)
def ml_item_item_cosine(spark, sf_dir):
    """Item-item collaborative filtering: cosine similarity of parts
    over their co-buyer sets — cos(i,j) = |buyers_i ∩ buyers_j| /
    sqrt(|buyers_i| * |buyers_j|) — the neighborhood recommender
    (Sarwar et al. 2001) next to the factorization path
    (ml_als_recommend). Pair generation is keyed per CUSTOMER
    (bounded basket sizes — pairs grow with Sum(basket^2), linear in
    rows for bounded baskets), never an all-parts cross join; sizes
    broadcast back. The cosine rides the 4dp grid with a total
    (cosine, i, j) order; counts are exact integers; the integer
    products are cast to double BEFORE multiplying (identical
    nearest-even both engines) and take one sqrt. Scale: the same
    candidate-bounded shape as llm_lsh_candidate_pairs. Reference
    analog: none (extends ml_als_recommend / graph_common_neighbors)."""
    buyers = (
        _t(spark, sf_dir, "lineitem")
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_partkey").alias("part"), F.col("o_custkey").alias("cust"))
        .distinct()
    )
    sz = buyers.groupBy("part").agg(F.count("*").cast("long").alias("n"))
    a, b = buyers.alias("a"), buyers.alias("b")
    pairs = (
        a.join(b, (F.col("a.cust") == F.col("b.cust")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(F.col("a.part").alias("i"), F.col("b.part").alias("j"))
        .agg(F.count("*").cast("long").alias("nij"))
    )
    si = sz.withColumnRenamed("part", "i").withColumnRenamed("n", "ni")
    sj = sz.withColumnRenamed("part", "j").withColumnRenamed("n", "nj")
    scored = (
        pairs.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            "nij",
            "ni",
            "nj",
            F.round(
                F.col("nij").cast("double")
                / F.sqrt(F.col("ni").cast("double") * F.col("nj").cast("double")),
                4,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("i"), F.asc("j")).limit(10)


_BUDGET_PCT = 50  # percent of total corpus tokens


@register(
    "llm_token_budget_fill",
    f"""
    WITH src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(len(list_filter(string_split(text, ' '),
                                           x -> x <> '')) AS BIGINT))
                  AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM src),
    ranked AS (
      -- // : integer division (DuckDB / on BIGINTs would yield DOUBLE
      -- and order by a rounded priority)
      SELECT source, n_docs, tokens,
             row_number() OVER (ORDER BY tokens * 1000000 // n_docs DESC,
                                source) AS prio,
             sum(tokens) OVER (ORDER BY tokens * 1000000 // n_docs DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_cum
      FROM src
    )
    SELECT CAST(prio AS BIGINT) AS prio, source, n_docs, tokens,
           CAST(greatest(0, least(tokens,
                (SELECT total * {_BUDGET_PCT} // 100 FROM tot)
                  - coalesce(prev_cum, 0))) AS BIGINT) AS allocated
    FROM ranked ORDER BY prio
    """,
)
def llm_token_budget_fill(spark, sf_dir):
    """Greedy token-budget allocation: sources ranked by token density
    (tokens-per-doc as the exact integer tokens*1e6 DIV n_docs —
    no float priority), filled in rank order until the budget (50% of
    corpus tokens, integer division) is exhausted; the partially-
    funded boundary source gets the exact remainder. One running
    prefix sum (1 PRECEDING frame) + an integer clamp — the
    distributed-prefix-sum allocation shape of llm_pack_sequences
    lifted to the source grain. Everything is exact integers.
    Scale: source-grain table is dimension-bounded; the window is
    trivial. Reference analog: none (extends llm_source_mix /
    llm_source_temperature_mix)."""
    words = F.size(
        F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    ).cast("long")
    src = (
        _t(spark, sf_dir, "documents")
        .select("source", words.alias("w"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("tokens"),
        )
    )
    tot = src.agg(F.sum("tokens").cast("long").alias("total"))
    prio_key = F.expr("tokens * 1000000 DIV n_docs")
    w_ord = Window.orderBy(F.desc(prio_key), F.asc("source"))
    ranked = src.select(
        "source",
        "n_docs",
        "tokens",
        F.row_number().over(w_ord).alias("prio"),
        F.sum("tokens").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)).alias(
            "prev_cum"
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.col("prio").cast("long").alias("prio"),
            "source",
            "n_docs",
            "tokens",
            F.greatest(
                F.lit(0),
                F.least(
                    F.col("tokens"),
                    F.expr(f"total * {_BUDGET_PCT} DIV 100")
                    - F.coalesce(F.col("prev_cum"), F.lit(0)),
                ),
            )
            .cast("long")
            .alias("allocated"),
        )
        .orderBy("prio")
    )


@register(
    "ext_interval_arithmetic",
    """
    WITH d AS (
      -- due_d adds 90 as a bare INTEGER (DuckDB DATE + INT = days):
      -- INTERVAL 90 DAY would compare EQUAL to INTERVAL 3 MONTH under
      -- DuckDB's normalized interval equality (1 month == 30 days) and
      -- common-subexpression elimination silently collapses the two
      -- additions into one — reproduced and confirmed on duckdb 1.0
      SELECT CAST(o_orderdate AS DATE) AS od,
             CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS due_m,
             CAST(o_orderdate AS DATE) + 90 AS due_d
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(date_diff('day', DATE '1970-01-01', CAST(due_m AS DATE)))
                AS BIGINT) AS sum_epochday_months,
           CAST(sum(date_diff('day', DATE '1970-01-01', CAST(due_d AS DATE)))
                AS BIGINT) AS sum_epochday_days,
           CAST(sum(CASE WHEN EXTRACT(day FROM od)
                         <> EXTRACT(day FROM CAST(due_m AS DATE))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_eom_clamped
    FROM d
    """,
)
def ext_interval_arithmetic(spark, sf_dir):
    """Calendar-interval semantics parity: orderdate + 3 months (with
    end-of-month clamping — Jan 31 + 3 months = Apr 30 on BOTH
    engines: Spark add_months and DuckDB + INTERVAL MONTH clamp
    identically) vs + 90 days (pure day arithmetic). The results ship
    as exact epoch-day checksums plus the count of clamped
    end-of-month cases — the date math every billing/due-date
    pipeline depends on, proven equivalent cross-engine rather than
    assumed. Scale: one scan, 4-cell aggregate. Reference analog:
    the reference derives date features (project/db.py:330-360); this
    pins the interval semantics."""
    od = F.col("o_orderdate").cast("date")
    due_m = F.add_months(od, 3)
    due_d = F.date_add(od, 90)
    d = _t(spark, sf_dir, "orders").select(
        od.alias("od"), due_m.alias("due_m"), due_d.alias("due_d")
    )
    epoch = F.lit("1970-01-01").cast("date")
    return d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.datediff(F.col("due_m"), epoch)).cast("long").alias("sum_epochday_months"),
        F.sum(F.datediff(F.col("due_d"), epoch)).cast("long").alias("sum_epochday_days"),
        F.sum(
            F.when(F.dayofmonth(F.col("od")) != F.dayofmonth(F.col("due_m")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_eom_clamped"),
    )
