"""Twelfth extension batch (round 5): production-ML monitoring and
ranking quality — two-sample Kolmogorov-Smirnov drift, smoothed PSI
(population stability index) bins, and exact NDCG@10 over the
embedding corpus.

These are the metrics a deployed pipeline computes NEXT to the models
the engine already fits (stump/tree/GD/NB) and the retrieval stack it
already serves (cosine/ANN/BM25): drift screens between data slices,
and graded ranking quality for the similarity search. The reference
has no eval surface beyond accuracy-style scoring
(project/database_and_model_tools.py:27-230).

Determinism contract: every cross-row float reduction is avoided —
KS uses exact integer-ratio CDF steps (max/argmax over identical
doubles), PSI emits per-bin terms (no cross-bin float sum), and NDCG
folds integer-scaled gain weights (the 1e9/log2(i+1) table is inlined
as literal BIGINTs in both engines, so no libm call happens at run
time)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .llm.similarity import _as_double, dot, norm
from .registry import _t, register


@register(
    "ml_ks_drift",
    """
    WITH g AS (
      SELECT n_chars AS score,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a_g,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS b_g
      FROM documents GROUP BY n_chars
    ),
    t AS (SELECT sum(a_g) AS na, sum(b_g) AS nb FROM g),
    c AS (
      SELECT score,
             abs(sum(a_g) OVER (ORDER BY score) / CAST(na AS DOUBLE)
                 - sum(b_g) OVER (ORDER BY score) / CAST(nb AS DOUBLE)) AS diff
      FROM g CROSS JOIN t
    ),
    m AS (SELECT max(diff) AS ks FROM c)
    SELECT (SELECT CAST(na AS BIGINT) FROM t) AS n_a,
           (SELECT CAST(nb AS BIGINT) FROM t) AS n_b,
           round(ks, 6) + 0 AS ks_stat,
           CAST(min(score) AS BIGINT) AS ks_at_score
    FROM c CROSS JOIN m WHERE diff = ks
    GROUP BY ks
    """,
)
def ml_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    length distributions of en vs non-en documents: max CDF gap plus
    the score where it occurs — the standard distribution-shift screen
    between data slices (train vs serve, yesterday vs today). Each CDF
    step is an exact integer/integer division, so `diff` is the
    identical double on both engines at any partitioning; max and the
    min-score argmax compare those exact values (no float-sum drift
    anywhere). Scale shape: one partial-aggregable groupBy collapses
    the corpus to |distinct scores| rows; the cumulative windows and
    the argmax run on that bounded candidate table."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("a"),
    )
    g = d.groupBy("score").agg(
        F.sum("a").alias("a_g"), F.sum(1 - F.col("a")).alias("b_g")
    )
    t = g.agg(F.sum("a_g").alias("na"), F.sum("b_g").alias("nb"))
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    c = g.crossJoin(F.broadcast(t)).select(
        "score",
        "na",
        "nb",
        F.abs(
            F.sum("a_g").over(w) / F.col("na").cast("double")
            - F.sum("b_g").over(w) / F.col("nb").cast("double")
        ).alias("diff"),
    )
    m = c.agg(F.max("diff").alias("ks"))
    return (
        c.crossJoin(F.broadcast(m))
        .filter(F.col("diff") == F.col("ks"))
        .groupBy("ks")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.min("score").cast("long").alias("ks_at_score"),
        )
        .select(
            "n_a",
            "n_b",
            (F.round(F.col("ks"), 6) + 0).alias("ks_stat"),
            "ks_at_score",
        )
    )


@register(
    "ml_psi_drift_bins",
    """
    WITH b AS (
      SELECT least(n_chars, 599) // 60 AS bin,
             sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS n_cur
      FROM documents GROUP BY 1
    ),
    t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM b)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           round((n_ref + 1) / CAST(tr + 10 AS DOUBLE), 6) + 0 AS p_ref,
           round((n_cur + 1) / CAST(tc + 10 AS DOUBLE), 6) + 0 AS p_cur,
           round(((n_ref + 1) / CAST(tr + 10 AS DOUBLE)
                  - (n_cur + 1) / CAST(tc + 10 AS DOUBLE))
                 * ln(((n_ref + 1) / CAST(tr + 10 AS DOUBLE))
                      / ((n_cur + 1) / CAST(tc + 10 AS DOUBLE))), 9) + 0
             AS psi_term
    FROM b CROSS JOIN t
    """,
)
def ml_psi_drift_bins(spark, sf_dir):
    """Population Stability Index bins between two deterministic
    corpus halves (even vs odd doc_id — the stand-in for reference vs
    current scoring window): per-bin (p_ref - p_cur) * ln(p_ref/p_cur)
    with add-one (Laplace) smoothing so empty bins stay finite. The
    output is the PER-BIN term table (total PSI = sum of a 10-row
    column the consumer adds up) — emitting terms instead of the
    cross-bin float sum keeps the result bit-stable across engines and
    partitionings; the smoothed ratios are single integer divisions and
    the lone ln() is rounded onto a 1e-9 grid. Scale shape: one
    partial-aggregable groupBy on a 10-value derived key + a broadcast
    1-row total."""
    d = _t(spark, sf_dir, "documents").select(
        F.expr("least(n_chars, 599) DIV 60").alias("bin"),
        F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0).alias("r"),
    )
    b = d.groupBy("bin").agg(
        F.sum("r").alias("n_ref"), F.sum(1 - F.col("r")).alias("n_cur")
    )
    t = b.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    pr = (F.col("n_ref") + 1) / (F.col("tr") + 10).cast("double")
    pc = (F.col("n_cur") + 1) / (F.col("tc") + 10).cast("double")
    return b.crossJoin(F.broadcast(t)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        (F.round(pr, 6) + 0).alias("p_ref"),
        (F.round(pc, 6) + 0).alias("p_cur"),
        (F.round((pr - pc) * F.log(pr / pc), 9) + 0).alias("psi_term"),
    )


# DCG gain weights: round(1e9 / log2(i+1)) for rank i = 1..10, and
# their prefix sums (the ideal DCG for n relevant docs, n <= 10).
# Inlined as literal BIGINTs in BOTH engines so no libm call happens at
# run time (every checked value is >= 0.07 from a rounding boundary).
_DCG_W = [
    1000000000, 630929754, 500000000, 430676558, 386852807,
    356207187, 333333333, 315464877, 301029996, 289064826,
]
_DCG_PREFIX = [
    1000000000, 1630929754, 2130929754, 2561606312, 2948459119,
    3304666306, 3637999639, 3953464516, 4254494512, 4543559338,
]
_W_SQL = "[" + ", ".join(str(x) for x in _DCG_W) + "]"
_PREFIX_SQL = "[" + ", ".join(str(x) for x in _DCG_PREFIX) + "]"
_W_SPARK = "array(" + ", ".join(f"{x}L" for x in _DCG_W) + ")"
_PREFIX_SPARK = "array(" + ", ".join(f"{x}L" for x in _DCG_PREFIX) + ")"


@register(
    "ml_ndcg_at_k",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
          FROM base WHERE vec_id < 20),
    nrel AS (
      SELECT q.query_id, count(*) AS n_rel
      FROM q JOIN base b ON b.label = q.qlabel AND b.vec_id <> q.query_id
      GROUP BY q.query_id
    ),
    scored AS (
      SELECT query_id, qlabel, b.vec_id AS neighbor_id, b.label,
             round(list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(v, v))), 4) AS sim
      FROM q, base b WHERE b.vec_id <> query_id
    ),
    ranked AS (
      SELECT query_id, qlabel, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ),
    dcg AS (
      SELECT query_id, qlabel,
             sum(CASE WHEN label = qlabel
                      THEN ({_W_SQL})[rnk] ELSE 0 END) AS dcg_scaled
      FROM ranked WHERE rnk <= 10 GROUP BY query_id, qlabel
    )
    SELECT d.query_id, CAST(d.qlabel AS BIGINT) AS label,
           CAST(n.n_rel AS BIGINT) AS n_rel,
           round(d.dcg_scaled
                 / CAST(({_PREFIX_SQL})[least(n.n_rel, 10)] AS DOUBLE), 6) + 0
             AS ndcg
    FROM dcg d JOIN nrel n USING (query_id)
    """,
)
def ml_ndcg_at_k(spark, sf_dir):
    """Exact NDCG@10 of cosine retrieval over the embedding corpus,
    with same-label as the (binary) relevance judgment — the graded
    ranking-quality metric for the engine's similarity-search stack
    (the companion to llm_knn_label_accuracy's hit-rate). Gains fold as
    integer-scaled BIGINT weights (the 1e9/log2 table above), ideal DCG
    is a prefix-sum lookup on least(n_rel, 10), and the only float ops
    are the 4dp-rounded cosine (norms precomputed, never re-folded per
    pair) and the final scaled division — engine- and partition-order
    exact. Scale shape: the 20-query panel broadcasts against a single
    corpus scan; per-query top-10 is a group-limit window; n_rel rides
    the same broadcast join."""
    base = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", _as_double(F.col("embedding")).alias("v"))
        .withColumn("nrm", norm(F.col("v")))
    )
    q = base.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    nrel = (
        base.join(
            F.broadcast(q),
            (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("query_id")),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 4
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    dcg = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .groupBy("query_id", "qlabel")
        .agg(
            F.sum(
                F.when(
                    F.col("label") == F.col("qlabel"),
                    F.expr(f"element_at({_W_SPARK}, rnk)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("dcg_scaled")
        )
    )
    return (
        dcg.join(nrel, "query_id")
        .select(
            "query_id",
            F.col("qlabel").cast("long").alias("label"),
            F.col("n_rel").cast("long").alias("n_rel"),
            (
                F.round(
                    F.col("dcg_scaled")
                    / F.expr(
                        f"CAST(element_at({_PREFIX_SPARK},"
                        f" CAST(least(n_rel, 10) AS INT)) AS DOUBLE)"
                    ),
                    6,
                )
                + 0
            ).alias("ndcg"),
        )
    )
