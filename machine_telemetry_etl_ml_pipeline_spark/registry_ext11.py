"""Eleventh extension batch (round 5): model-evaluation metrics and
scale-toolkit operators — exact ROC-AUC, calibration/Brier bins, a
hand-rolled Bloom-filter join pre-filter (the manual runtime-filter
pattern), weighted corpus sampling without replacement (A-Res), the
hashing-trick featurizer, and closed-form ridge regression.

The reference stops at accuracy-style eval (its model tools fit and
score but never report threshold-free metrics —
project/database_and_model_tools.py:27-230); these extend the engine's
ML-eval and 100 TB-toolkit surface per the build mandate. Every entry
is exact-oracle and RNG-free: hash-derived uniforms replace RNG, money
math runs in integer cents, and every float that crosses an engine
boundary is either an exact integer ratio or rounded once onto a
coarse grid.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .llm.prep import md5_bucket
from .llm.textstats import words_col
from .registry import _t, register


def _hex_bucket_sql(h_expr: str, n_digits: int) -> str:
    """DuckDB twin of llm/prep.md5_bucket: integer in [0, 16^n) from
    the first n hex digits of an md5 expression — keep in lockstep."""
    digit = "(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)"
    out = digit.format(h=h_expr, p=1)
    for p in range(2, n_digits + 1):
        out = f"({out} * 16 + {digit.format(h=h_expr, p=p)})"
    return out


# =========================================================================
# ML evaluation metrics
# =========================================================================


@register(
    "ml_roc_auc",
    """
    WITH g AS (
      SELECT n_chars AS score,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos_g,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg_g
      FROM documents GROUP BY n_chars
    ),
    c AS (
      SELECT pos_g, neg_g,
             coalesce(sum(neg_g) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
      FROM g
    ),
    t AS (
      SELECT sum(pos_g * (2 * cum_neg + neg_g)) AS u2,
             sum(pos_g) AS p, sum(neg_g) AS n
      FROM c
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
           round(u2 / (2.0 * p * n), 6) + 0 AS auc
    FROM t
    """,
)
def ml_roc_auc(spark, sf_dir):
    """Exact ROC-AUC (threshold-free ranking quality) of document
    length predicting lang='en', via the tie-corrected Mann-Whitney
    rank-sum: AUC = sum over score groups of pos_g * (neg_below +
    neg_tied/2) / (P*N). The doubled numerator u2 stays an exact
    BIGINT (every half becomes an integer), so the only float op is
    the final division — bit-identical on both engines at any
    partitioning. Scale shape: one partial-aggregable groupBy collapses
    N rows to |distinct scores| (the candidate table, same bound as
    ml_decision_stump), and the ordered cum-sum window runs on that
    bounded table — never on the input."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    g = d.groupBy("score").agg(
        F.sum("y").alias("pos_g"),
        F.sum(1 - F.col("y")).alias("neg_g"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "pos_g",
        "neg_g",
        F.coalesce(F.sum("neg_g").over(w), F.lit(0)).alias("cum_neg"),
    )
    t = c.agg(
        F.sum(F.col("pos_g") * (2 * F.col("cum_neg") + F.col("neg_g"))).alias("u2"),
        F.sum("pos_g").alias("p"),
        F.sum("neg_g").alias("n"),
    )
    return t.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_neg"),
        (F.round(F.col("u2") / (2.0 * F.col("p") * F.col("n")), 6) + 0).alias("auc"),
    )


@register(
    "ml_calibration_bins",
    """
    SELECT least(n_chars, 599) // 60 AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(least(n_chars, 600)) / (600.0 * count(*)), 6) + 0 AS avg_pred,
           round(sum(y) / CAST(count(*) AS DOUBLE), 6) + 0 AS pos_rate,
           round(sum((least(n_chars, 600) - 600 * y)
                     * (least(n_chars, 600) - 600 * y))
                 / (count(*) * 360000.0), 6) + 0 AS brier
    FROM (SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents)
    GROUP BY 1
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Calibration (reliability) bins + per-bin Brier score for the
    monotone length-score p_hat = min(n_chars,600)/600 against
    lang='en': the reliability-diagram table every production scoring
    pipeline emits next to AUC. All aggregation is integer (scaled
    residuals e = min(n_chars,600) - 600*y, so sum(e^2) is an exact
    BIGINT); each output float is a single integer/integer division —
    no partial-sum float drift at any partitioning. Scale shape: one
    partial-aggregable groupBy on a 10-value derived key."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    s = F.least(F.col("n_chars"), F.lit(600))
    e = s - 600 * F.col("y")
    return (
        d.groupBy(F.expr("least(n_chars, 599) DIV 60").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.round(F.sum(s) / (600.0 * F.count(F.lit(1))), 6) + 0).alias("avg_pred"),
            (F.round(F.sum("y") / F.count(F.lit(1)).cast("double"), 6) + 0).alias(
                "pos_rate"
            ),
            (F.round(F.sum(e * e) / (F.count(F.lit(1)) * 360000.0), 6) + 0).alias(
                "brier"
            ),
        )
    )


@register(
    "ml_ridge_regression_normal_eq",
    """
    WITH f AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT count(*) AS n, sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
             sum(x1 * x1) AS sx11, sum(x1 * x2) AS sx12,
             sum(x2 * x2) AS sx22, sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y
      FROM f
    ),
    a AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) AS a11, CAST(sx1 AS DOUBLE) AS a12,
             CAST(sx2 AS DOUBLE) AS a13,
             CAST(sx11 AS DOUBLE) + 1000000.0 AS a22,
             CAST(sx12 AS DOUBLE) AS a23,
             CAST(sx22 AS DOUBLE) + 1000000.0 AS a33,
             CAST(sy AS DOUBLE) AS b1, CAST(sx1y AS DOUBLE) AS b2,
             CAST(sx2y AS DOUBLE) AS b3
      FROM m
    )
    SELECT n,
           round((b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
                  + a13*(b2*a23 - a22*b3))
                 / (a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
                    + a13*(a12*a23 - a22*a13)), 6) + 0 AS beta0,
           round((a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
                  + a13*(a12*b3 - b2*a13))
                 / (a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
                    + a13*(a12*a23 - a22*a13)), 6) + 0 AS beta1,
           round((a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
                  + b1*(a12*a23 - a22*a13))
                 / (a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
                    + a13*(a12*a23 - a22*a13)), 6) + 0 AS beta2
    FROM a
    """,
)
def ml_ridge_regression_normal_eq(spark, sf_dir):
    """Closed-form ridge regression (lambda = 1e6 cents^2, intercept
    unpenalized): price-cents ~ quantity + discount-cents on lineitem,
    solved by Cramer's rule on the 3x3 normal equations. The Gramian
    moments are exact BIGINT sums of integer features (cents math), so
    the only floats are the final fixed-shape determinant expressions —
    identical literal arithmetic on both engines, partition-order
    independent. Scale shape: ONE partial-aggregable scan collapses the
    fact table to 9 scalars; the solve is O(1). This is the Gramian
    collapse that makes linear models embarrassingly scalable (the same
    shape ml_pca_power_iteration uses for its covariance)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_quantity")).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    a = m.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(n AS DOUBLE) AS a11",
        "CAST(sx1 AS DOUBLE) AS a12",
        "CAST(sx2 AS DOUBLE) AS a13",
        "CAST(sx11 AS DOUBLE) + 1000000.0 AS a22",
        "CAST(sx12 AS DOUBLE) AS a23",
        "CAST(sx22 AS DOUBLE) + 1000000.0 AS a33",
        "CAST(sy AS DOUBLE) AS b1",
        "CAST(sx1y AS DOUBLE) AS b2",
        "CAST(sx2y AS DOUBLE) AS b3",
    )
    det = (
        "(a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)"
        " + a13*(a12*a23 - a22*a13))"
    )
    return a.selectExpr(
        "n",
        f"round((b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)"
        f" + a13*(b2*a23 - a22*b3)) / {det}, 6) + 0 AS beta0",
        f"round((a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)"
        f" + a13*(a12*b3 - b2*a13)) / {det}, 6) + 0 AS beta1",
        f"round((a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)"
        f" + b1*(a12*a23 - a22*a13)) / {det}, 6) + 0 AS beta2",
    )


# =========================================================================
# Scale toolkit: Bloom-filter join pre-filter
# =========================================================================

_BLOOM_H1 = _hex_bucket_sql("md5(CAST(o_custkey AS VARCHAR))", 4)
_BLOOM_H2 = _hex_bucket_sql("md5('b2|' || CAST(o_custkey AS VARCHAR))", 4)


@register(
    "ext_bloom_prefilter_join",
    f"""
    WITH keys AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
    ),
    khash AS (
      SELECT o_custkey, {_BLOOM_H1} AS h1, {_BLOOM_H2} AS h2 FROM keys
    ),
    bits AS (
      SELECT h // 32 AS word, CAST(1 AS BIGINT) << (h % 32) AS v
      FROM (SELECT h1 AS h FROM khash UNION ALL SELECT h2 FROM khash)
    ),
    bloom AS (SELECT word, bit_or(v) AS bits FROM bits GROUP BY word),
    probe AS (
      SELECT o.o_custkey, {_BLOOM_H1} AS h1, {_BLOOM_H2} AS h2 FROM orders o
    ),
    flagged AS (
      SELECT p.o_custkey,
             CASE WHEN coalesce(b1.bits >> (p.h1 % 32), 0) % 2 = 1
                   AND coalesce(b2.bits >> (p.h2 % 32), 0) % 2 = 1
                  THEN 1 ELSE 0 END AS cand,
             CASE WHEN k.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM probe p
      LEFT JOIN bloom b1 ON b1.word = p.h1 // 32
      LEFT JOIN bloom b2 ON b2.word = p.h2 // 32
      LEFT JOIN keys k ON k.o_custkey = p.o_custkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM keys) AS n_keys,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cand) AS BIGINT) AS n_candidates,
           CAST(sum(hit) AS BIGINT) AS n_true,
           round((sum(cand) - sum(hit))
                 / CAST(count(*) - sum(hit) AS DOUBLE), 6) + 0 AS fp_rate
    FROM flagged
    """,
)
def ext_bloom_prefilter_join(spark, sf_dir):
    """Hand-rolled Bloom-filter join pre-filter — the manual form of the
    runtime filter a cluster injects for selective joins (Spark's
    spark.sql.optimizer.runtime.bloomFilter; bloom_filter_agg is not
    SQL-exposed in this build, so the filter is built from integer md5
    bit arithmetic, which also makes it exactly oracle-checkable). The
    key set (high-value urgent customers) collapses to a 64 Kib bloom:
    2 hash positions per key, words built by a partial-aggregable
    bit_or groupBy into <= 2048 (word, bits) rows that BROADCAST to the
    fact scan. Each fact row probes two broadcast-joined words with
    shift/mask arithmetic; only candidates would reach the exact join.
    At 100 TB the pre-filter drops ~(1-sel)*(1-fp) of fact bytes before
    the shuffle — the reported fp_rate (~5% at this load factor) is the
    knob the m/k sizing controls. The final exact semi-join keeps
    correctness independent of fp_rate; counts here prove both the
    candidate arithmetic and the no-false-negative invariant
    (n_true <= n_candidates always)."""
    orders = _t(spark, sf_dir, "orders")
    keys = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
        )
        .select("o_custkey")
        .distinct()
    )
    h1 = md5_bucket(F.col("o_custkey"), 4)
    h2 = md5_bucket(F.concat(F.lit("b2|"), F.col("o_custkey").cast("string")), 4)
    khash = keys.select("o_custkey", h1.alias("h1"), h2.alias("h2"))
    bits = (
        khash.select(F.col("h1").alias("h"))
        .unionAll(khash.select(F.col("h2").alias("h")))
        .selectExpr("h DIV 32 AS word", "shiftleft(CAST(1 AS BIGINT), h % 32) AS v")
    )
    bloom = bits.groupBy("word").agg(F.expr("bit_or(v)").alias("bits"))
    probe = orders.select("o_custkey", h1.alias("h1"), h2.alias("h2"))
    b1 = bloom.selectExpr("word AS w1", "bits AS bits1")
    b2 = bloom.selectExpr("word AS w2", "bits AS bits2")
    kmark = keys.select(F.col("o_custkey").alias("k_custkey"), F.lit(1).alias("hit1"))
    flagged = (
        probe.join(F.broadcast(b1), F.expr("w1 = h1 DIV 32"), "left")
        .join(F.broadcast(b2), F.expr("w2 = h2 DIV 32"), "left")
        .join(F.broadcast(kmark), F.col("k_custkey") == F.col("o_custkey"), "left")
        .selectExpr(
            "CASE WHEN coalesce(bits1 >> (h1 % 32), 0) % 2 = 1"
            " AND coalesce(bits2 >> (h2 % 32), 0) % 2 = 1 THEN 1 ELSE 0 END AS cand",
            "coalesce(hit1, 0) AS hit",
        )
    )
    stats = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cand").cast("long").alias("n_candidates"),
        F.sum("hit").cast("long").alias("n_true"),
    )
    nk = keys.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    return stats.crossJoin(F.broadcast(nk)).selectExpr(
        "n_keys",
        "n_rows",
        "n_candidates",
        "n_true",
        "round((n_candidates - n_true) / CAST(n_rows - n_true AS DOUBLE), 6) + 0"
        " AS fp_rate",
    )


# =========================================================================
# LLM-data toolkit: weighted sampling + feature hashing
# =========================================================================

_WS_BUCKET = _hex_bucket_sql("md5(CAST(doc_id AS VARCHAR))", 7)


@register(
    "llm_weighted_sample",
    f"""
    SELECT doc_id, n_chars,
           round(ln(({_WS_BUCKET} + 1) / 268435456.0)
                 / greatest(n_chars, 1), 12) + 0 AS wkey
    FROM documents
    ORDER BY wkey DESC, doc_id LIMIT 200
    """,
)
def llm_weighted_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-Res), length-proportional: each doc draws the deterministic
    uniform u = (md5_bucket(doc_id, 7)+1) / 2^28 and ranks by
    ln(u)/weight descending — the top-k under this key is an exact
    weighted sample, the primitive behind importance-weighted corpus
    mixing. RNG-free: u is a pure function of doc_id, so the sample is
    reproducible across runs, engines, and cluster sizes (and 2^28 is a
    power of two, so u itself is exact). The key is rounded to 1e-12
    (~1000x above cross-engine ln() ulp noise) with a doc_id tiebreak.
    Scale shape: narrow projection + TakeOrderedAndProject (per-partition
    top-k heaps, driver merges k*partitions rows) — no global sort, no
    shuffle of the corpus."""
    d = _t(spark, sf_dir, "documents")
    u = (md5_bucket(F.col("doc_id"), 7) + 1) / F.lit(268435456.0)
    wkey = F.round(F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)), 12) + 0
    return (
        d.select("doc_id", "n_chars", wkey.alias("wkey"))
        .orderBy(F.col("wkey").desc(), "doc_id")
        .limit(200)
    )


@register(
    "llm_hashed_features",
    """
    WITH words AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    b AS (
      SELECT source,
             (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS bucket,
             count(*) AS n_tokens
      FROM words GROUP BY 1, 2
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_tokens / CAST(sum(n_tokens) OVER (PARTITION BY source)
                                 AS DOUBLE), 6) + 0 AS share
    FROM b
    """,
)
def llm_hashed_features(spark, sf_dir):
    """Hashing-trick featurizer (the fixed-width bag-of-words every
    scalable text classifier uses instead of a vocabulary dictionary):
    tokens map to one of 256 md5 buckets, giving a per-source hashed
    term-frequency vector with no global vocab build, no OOV, and a
    schema that never changes as the corpus grows. Scale shape: one
    Generate (explode) linear in tokens, one partial-aggregable
    groupBy on (source, bucket) — the map-side combine collapses to at
    most 256 rows per source per task — and a share window on the
    already-tiny result. The dictionary-free property is the point at
    100 TB: no driver-side vocabulary, no second pass."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("source", F.explode(words_col(F.col("text"))).alias("w"))
    b = w.groupBy(
        "source", md5_bucket(F.col("w"), 2).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    win = Window.partitionBy("source")
    return b.select(
        "source",
        "bucket",
        "n_tokens",
        (
            F.round(F.col("n_tokens") / F.sum("n_tokens").over(win).cast("double"), 6)
            + 0
        ).alias("share"),
    )
