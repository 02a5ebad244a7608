"""Fourteenth extension batch (round 5): experimentation analytics —
the two-sample significance tests an A/B platform computes over event
logs: a two-proportion z-test on conversion rates and Welch's unequal-
variance t-test on order values.

They complete the statistical-monitoring family (chi-square
independence, KS/PSI drift, Spearman association) with the
hypothesis-testing readouts; the reference has no testing surface at
all (its stats stop at avg/min/max, project/db.py:315-341).

Determinism contract: group assignment is a deterministic md5 parity
(no RNG), every cross-row reduction is an exact integer sum (event
counts; order values in integer cents via round(x*100) of the shared
double), and each final statistic is one scalar float formula over
those exact integers, rounded onto a 1e-6 grid on both engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t, register

# deterministic 2-arm split: md5 parity of the user id — portable, and
# the idiom a real platform uses for sticky bucketing
_ARM_SQL = "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2)"


def _arm_spark():
    return (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    ).alias("arm")


@register(
    "ml_ab_ztest_conversion",
    f"""
    WITH assigned AS (
      SELECT user_id, {_ARM_SQL} AS arm,
             max(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) = DATE '2024-01-29'
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, count(*) AS n, sum(converted) AS conv
      FROM assigned GROUP BY arm
    ),
    wide AS (
      SELECT
        max(CASE WHEN arm = 0 THEN n END) AS n0,
        max(CASE WHEN arm = 0 THEN conv END) AS c0,
        max(CASE WHEN arm = 1 THEN n END) AS n1,
        max(CASE WHEN arm = 1 THEN conv END) AS c1
      FROM arms
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
           round(CAST(c0 AS DOUBLE) / n0, 6) + 0 AS rate_control,
           round(CAST(c1 AS DOUBLE) / n1, 6) + 0 AS rate_treat,
           round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) + 0 AS z_stat
    FROM wide
    """,
)
def ml_ab_ztest_conversion(spark, sf_dir):
    """Two-proportion z-test on user conversion (a 'purchase' on the
    experiment day, 2024-01-29 — a single-day metric so both arms keep
    genuine variance; lifetime conversion saturates at 1.0 and the
    pooled standard error degenerates to 0) between two deterministic
    md5-parity arms — the A/B significance readout with
    pooled-variance standard error. Per-user conversion
    collapses with max(), arm totals are exact integer counts, and the
    z statistic is a single scalar formula over four exact BIGINTs —
    identical doubles on both engines at any partition order, rounded
    onto a 1e-6 grid. Scale shape: one partial-aggregable groupBy on
    user_id (the only input-sized shuffle), a 2-row arm rollup, and a
    1-row pivot; at 100 TB this is exactly the nightly-experiment
    scorecard plan — nothing downstream of the first groupBy sees more
    than |users| rows."""
    assigned = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            _arm_spark(),
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts").cast("date") == F.lit("2024-01-29").cast("date")),
                1,
            )
            .otherwise(0)
            .alias("cv"),
        )
        .groupBy("user_id", "arm")
        .agg(F.max("cv").alias("converted"))
    )
    arms = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    n0 = F.col("n0").cast("double")
    c0 = F.col("c0").cast("double")
    n1 = F.col("n1").cast("double")
    c1 = F.col("c1").cast("double")
    pooled = (c0 + c1) / (n0 + n1)
    return wide.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treat"),
        F.col("c1").cast("long").alias("conv_treat"),
        (F.round(c0 / n0, 6) + 0).alias("rate_control"),
        (F.round(c1 / n1, 6) + 0).alias("rate_treat"),
        (
            F.round(
                (c1 / n1 - c0 / n0)
                / F.sqrt(pooled * (1 - pooled) * (F.lit(1.0) / n0 + F.lit(1.0) / n1)),
                6,
            )
            + 0
        ).alias("z_stat"),
    )


@register(
    "ml_welch_ttest",
    """
    WITH v AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    m AS (
      SELECT grp, count(*) AS n, sum(cents) AS s,
             sum(cents * cents) AS ss
      FROM v GROUP BY grp
    ),
    wide AS (
      SELECT
        max(CASE WHEN grp = 0 THEN n END) AS n0,
        max(CASE WHEN grp = 0 THEN CAST(s AS DOUBLE) END) AS s0,
        max(CASE WHEN grp = 0 THEN CAST(ss AS DOUBLE) END) AS ss0,
        max(CASE WHEN grp = 1 THEN n END) AS n1,
        max(CASE WHEN grp = 1 THEN CAST(s AS DOUBLE) END) AS s1,
        max(CASE WHEN grp = 1 THEN CAST(ss AS DOUBLE) END) AS ss1
      FROM m
    )
    SELECT CAST(n0 AS BIGINT) AS n_low, CAST(n1 AS BIGINT) AS n_high,
           round(s0 / n0 / 100, 6) + 0 AS mean_low,
           round(s1 / n1 / 100, 6) + 0 AS mean_high,
           round((s1 / n1 - s0 / n0)
                 / sqrt(((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0
                        + ((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1)
                 , 6) + 0 AS t_stat,
           round(pow(((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0
                     + ((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1, 2)
                 / (pow(((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0, 2) / (n0 - 1)
                    + pow(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1, 2) / (n1 - 1))
                 , 4) + 0 AS welch_df
    FROM wide
    """,
)
def ml_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test on order value between priority
    segments (urgent/high vs rest), with the Welch-Satterthwaite
    degrees of freedom. Order values reduce as exact integer-cent sums
    and sums of squares (DECIMAL(38,0) on Spark / HUGEINT on DuckDB —
    cents^2 is ~2.5e15 per row, past BIGINT within thousands of rows),
    so the t statistic
    and df are single scalar formulas over exact integers — identical
    doubles cross-engine at any partitioning, on 1e-6/1e-4 grids. The
    mean/variance terms mirror ml_ks_drift's slice-comparison role for
    the CONTINUOUS-metric case. Scale shape: one partial-aggregable
    groupBy collapsing the fact table to two moment rows; the test
    itself runs on a 1-row pivot. Reference analog: none
    (project/db.py:315-341 stops at avg/min/max)."""
    v = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # cents^2 sums pass BIGINT range immediately (5e7 cents squared is
    # 2.5e15/row); accumulate in DECIMAL(38,0), exact like the oracle's
    # HUGEINT — the ml_spearman_corr overflow lesson applied up front
    m = v.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("ss"),
    )
    wide = m.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("s").cast("double"))).alias("s0"),
        F.max(F.when(F.col("grp") == 0, F.col("ss").cast("double"))).alias("ss0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s").cast("double"))).alias("s1"),
        F.max(F.when(F.col("grp") == 1, F.col("ss").cast("double"))).alias("ss1"),
    )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    s0, ss0, s1, ss1 = F.col("s0"), F.col("ss0"), F.col("s1"), F.col("ss1")
    se0 = ((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0
    se1 = ((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
    return wide.select(
        F.col("n0").cast("long").alias("n_low"),
        F.col("n1").cast("long").alias("n_high"),
        (F.round(s0 / n0 / 100, 6) + 0).alias("mean_low"),
        (F.round(s1 / n1 / 100, 6) + 0).alias("mean_high"),
        (F.round((s1 / n1 - s0 / n0) / F.sqrt(se0 + se1), 6) + 0).alias("t_stat"),
        (
            F.round(
                F.pow(se0 + se1, 2)
                / (F.pow(se0, 2) / (n0 - 1) + F.pow(se1, 2) / (n1 - 1)),
                4,
            )
            + 0
        ).alias("welch_df"),
    )


@register(
    "ml_mann_whitney_u",
    """
    WITH v AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT grp,
             2 * rank() OVER (ORDER BY cents)
               + count(*) OVER (PARTITION BY cents) - 1 AS rr2
      FROM v
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS tc
      FROM v GROUP BY cents HAVING count(*) > 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN grp = 1 THEN rr2 ELSE 0 END) AS DOUBLE) AS r1_2,
             CAST(sum(grp) AS BIGINT) AS n1,
             CAST(count(*) AS BIGINT) AS n
      FROM r
    ),
    tie AS (SELECT CAST(coalesce(sum(tc * tc * tc - tc), 0) AS DOUBLE) AS tsum FROM t)
    SELECT n1, n - n1 AS n0,
           round(r1_2 / 2 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2, 1) + 0 AS u_stat,
           round(((r1_2 / 2 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2)
                  - CAST(n1 * (n - n1) AS DOUBLE) / 2)
                 / sqrt(CAST(n1 * (n - n1) AS DOUBLE) / 12
                        * ((n + 1) - tsum / (CAST(n AS DOUBLE) * (n - 1)))), 6) + 0
             AS z_stat
    FROM s CROSS JOIN tie
    """,
)
def ml_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between the order-priority
    segments — the nonparametric sibling of ml_welch_ttest, with the
    normal approximation's tie-corrected variance. Tie-averaged ranks
    are pre-scaled to exact integers (the ml_spearman_corr trick:
    2*avg_rank = 2*rank + tie_count - 1), the rank sum and the
    tie-correction sum(t^3 - t) reduce as exact integer sums, and U
    plus the z statistic are single scalar formulas over those exact
    values — identical doubles cross-engine at any partition order.
    Scale shape (r14 session 2, guide §2.2 — the equiheight prefix-sum
    pattern): the doubled tie-averaged rank is a function of cents
    alone (rr2 = 2*prefix_count_below + tc + 1), so the r13 global
    rank window — whose Exchange SinglePartition funneled EVERY order
    row through one sort task, the 100 TB straggler — is replaced by
    a partial-aggregable (cents, tc, c1) rollup plus the fixed-width
    integer-bucket distributed prefix sum (cents DIV 65536 is
    monotone; the only SinglePartition left is over the ~850-row
    bucket totals). The grouped rank sum sum(c1 * rr2) equals the
    per-row sum exactly (integer arithmetic in DECIMAL(38,0)), and
    sum(tc^3 - tc) no longer needs its tc>1 filter (singleton terms
    are identically zero). Outputs bit-identical (u/z compared by
    IEEE bit pattern) at all three SFs; local cost ~+9% (calm-window
    A/B: 0.766 one-task window / 0.834 this shape / 0.914 a first cut
    that derived bucket totals from the windowed frame) — the win is
    the removed one-task sort, not local seconds.
    Reference analog: none."""
    from pyspark.sql import Window

    v = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    roll = v.groupBy("cents").agg(
        F.count(F.lit(1)).alias("tc"), F.sum("grp").alias("c1")
    )
    bkt = roll.withColumn("__b", F.expr("cents DIV 65536"))
    w_local = (
        Window.partitionBy("__b")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bkt.withColumn("__cum", F.sum("tc").over(w_local))
    # bucket totals come straight off the scan (partial-aggregable
    # ~850-group count), NOT off `local`: deriving them from the
    # windowed frame re-embedded the whole rollup+window subtree in
    # the offsets branch (A/B at sf0.1, 6 interleaved reps: 0.914 s
    # from-local vs 0.834 s from-scan; the one-task r13 window read
    # 0.766 in the same window — the residual gap is the price of
    # removing the SinglePartition sort, same trade equiheight made)
    totals = v.groupBy(F.expr("cents DIV 65536").alias("__b")).agg(
        F.count(F.lit(1)).alias("__tot")
    )
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off")
    )
    cum = local.join(F.broadcast(offsets), "__b").select(
        "tc",
        "c1",
        (F.col("__cum") + F.col("__off") - F.col("tc")).alias("before"),
    )
    # rank sums and tc^3 exceed BIGINT once a group passes ~2M ties /
    # ~1.5e9 rows (ANSI Spark errors; DuckDB silently promotes to
    # HUGEINT) — accumulate in DECIMAL(38,0) like ml_spearman_corr and
    # only convert to double in the final scalar formula
    dec = "decimal(38,0)"
    # rr2 = 2*rank + tc - 1 with rank = prefix_count_below + 1
    rr2 = (2 * F.col("before") + F.col("tc") + 1).cast(dec)
    tcd = F.col("tc").cast(dec)
    s = cum.agg(
        F.sum(F.col("c1").cast(dec) * rr2).cast("double").alias("r1_2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("tc").cast("long").alias("n"),
        F.coalesce(F.sum(tcd * tcd * tcd - tcd), F.lit(0).cast(dec))
        .cast("double")
        .alias("tsum"),
    )
    n1 = F.col("n1")
    n = F.col("n")
    u = F.col("r1_2") / 2 - (n1 * (n1 + 1)).cast("double") / 2
    var = (n1 * (n - n1)).cast("double") / 12 * (
        (n + 1) - F.col("tsum") / (n.cast("double") * (n - 1))
    )
    return s.select(
        "n1",
        (n - n1).alias("n0"),
        (F.round(u, 1) + 0).alias("u_stat"),
        (
            F.round((u - (n1 * (n - n1)).cast("double") / 2) / F.sqrt(var), 6) + 0
        ).alias("z_stat"),
    )


@register(
    "ext_cusum_changepoint",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS x FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total FROM d),
    c AS (
      SELECT day, x,
             row_number() OVER (ORDER BY day) AS i,
             CAST(sum(x) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM d
    ),
    dev AS (
      SELECT day, x, i, cum,
             abs(CAST(n AS BIGINT) * cum - i * total) AS ndev
      FROM c CROSS JOIN t
    ),
    m AS (SELECT max(ndev) AS mx FROM dev)
    SELECT d.day AS change_day, d.x AS day_count,
           CAST(d.cum AS BIGINT) AS cum_events,
           CAST(d.ndev AS BIGINT) AS scaled_max_dev,
           round(CAST(d.ndev AS DOUBLE) / n, 4) + 0 AS max_dev
    FROM dev d CROSS JOIN m CROSS JOIN t
    WHERE d.ndev = m.mx
    ORDER BY d.day LIMIT 1
    """,
)
def ext_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection on the daily event-count series:
    the day maximizing |cumsum(x) - i*mean| — where the running total
    most departs from the uniform-rate line — is the classic
    level-shift estimator. The deviation is computed SCALED BY n
    (n*cumsum - i*total), so the argmax runs entirely on exact
    BIGINTs; only the reported max_dev divides back to a double. One
    partial-aggregable groupBy collapses the stream to |days| rows;
    the cumulative window, broadcast totals, and argmax all run on
    that calendar-bounded table. The earliest-day tiebreak is pinned
    on both engines. Reference analog: none — the drift-alarm
    companion to ml_ks_drift for time-ordered rates."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("day")
    c = d.select(
        "day",
        "x",
        F.row_number().over(w).alias("i"),
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    dev = c.crossJoin(F.broadcast(t)).select(
        "day",
        "x",
        "i",
        "cum",
        "n",
        F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("total")).alias("ndev"),
    )
    m = dev.agg(F.max("ndev").alias("mx"))
    return (
        dev.crossJoin(F.broadcast(m))
        .filter(F.col("ndev") == F.col("mx"))
        .orderBy("day")
        .limit(1)
        .select(
            F.col("day").alias("change_day"),
            F.col("x").alias("day_count"),
            F.col("cum").alias("cum_events"),
            F.col("ndev").cast("long").alias("scaled_max_dev"),
            (F.round(F.col("ndev").cast("double") / F.col("n"), 4) + 0).alias(
                "max_dev"
            ),
        )
    )


@register(
    "ext_source_text",
    """
    WITH lines AS (
      SELECT coalesce(regexp_replace(text, '[\\r\\n]+', ' ', 'g'), '') AS line
      FROM documents
    )
    SELECT count(*) AS n_lines,
           CAST(sum(length(line)) AS BIGINT) AS sum_chars,
           count(DISTINCT line) AS n_distinct,
           CAST(sum(('0x' || substr(md5(line), 1, 8))::BIGINT) AS BIGINT)
             AS md5_digest
    FROM lines
    """,
)
def ext_source_text(spark, sf_dir):
    """Plain-text file source round trip (the last cell of the source
    matrix: CSV/JSONL/ORC/XML/parquet/binaryFile/Python-DataSource +
    text): document bodies are newline-normalized (a text line IS the
    record delimiter — un-normalized embedded newlines would silently
    split records), written with write.text, read back with
    spark.read.text, and digested (line count, char mass, distinct
    lines, order-insensitive md5 sum) against an oracle that
    recomputes the same digests straight from the table. Scale shape:
    narrow write + narrow scan, no shuffle until the 1-row digest
    aggregate; text is the raw-corpus interchange format an LLM
    pipeline ingests by the shard."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="text_src_")
    try:
        path = root + "/docs"
        # coalesce NULL bodies to '' — the text writer requires a
        # non-null value column (regexp_replace propagates null)
        src = _t(spark, sf_dir, "documents").select(
            F.coalesce(
                F.regexp_replace("text", r"[\r\n]+", " "), F.lit("")
            ).alias("value")
        )
        src.write.mode("overwrite").text(path)
        back = spark.read.text(path)
        out = back.agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.length("value")).alias("sum_chars"),
            F.countDistinct("value").alias("n_distinct"),
            F.sum(
                F.conv(F.substring(F.md5("value"), 1, 8), 16, 10).cast("long")
            ).alias("md5_digest"),
        )
        # materialize before the temp dir is removed — the returned
        # plan must not depend on the scratch files
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
