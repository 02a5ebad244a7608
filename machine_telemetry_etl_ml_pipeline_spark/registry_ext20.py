"""Twentieth extension batch (round 6, part 5): robust statistics,
data-layout clustering, and two corpus screens.

- `ml_kendall_tau`: Kendall's tau-b rank correlation (with tie
  corrections) between per-nation customer count and total account
  balance — the robust companion to ml_spearman_corr. The pairwise
  comparison runs on the NATION-bounded aggregate table (<=25 rows ->
  <=300 pairs), never on the raw data: concordant/discordant/tie
  counts are exact integers; tau-b is one IEEE formula over them.
- `ml_theil_sen_slope`: Theil-Sen robust trend estimator (median of
  pairwise slopes) for the daily purchase-cents series — the
  outlier-immune alternative to the OLS slope (ml_ols_inference).
  Pairs are calendar-bounded (days^2, not rows^2); each slope is one
  integer-ratio division; the median rides the proven Spark
  percentile == DuckDB quantile_cont interpolation pair.
- `ext_zorder_cluster`: Z-order (Morton) interleaving of the
  (price-bucket, size-bucket) key — the multi-dimensional data-
  clustering layout (Delta/Iceberg OPTIMIZE ZORDER analog): sorting
  by the interleaved key co-locates rows close in BOTH dimensions,
  so min/max file skipping prunes on either predicate. The entry
  groups parts by the top-8 Morton bits and reports per-cluster
  bounding boxes — the spans the skipping index would store.
- `llm_code_detect`: code-vs-prose screen over the corpus (semicolon
  / brace / equals densities per kilochar) — the routing classifier
  an LLM pipeline runs before language-specific cleaning. Densities
  are all-integer permille arithmetic.
- `llm_embedding_outliers`: per-label embedding outliers — top-5
  vectors farthest (L2^2) from their label centroid — the
  mislabeled-example screen next to llm_nearest_centroid_accuracy.
  Centroids are 4dp-rounded elementwise means (the
  llm_embedding_centroids doctrine); distances expand as dot(v,v) -
  2 dot(v,c) + dot(c,c) with the SAME left-to-right fold both
  engines, shipped unrounded; the per-label top-5 carries a
  (dist2 DESC, vec_id) total order.

Determinism contract: all counts/buckets/Morton codes exact integers;
doubles are single IEEE formulas over integers, identical ordered
folds, or the percentile interpolation pair. Reference analog: none
(beyond the reference surface)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register

# Morton interleave of two 8-bit buckets, expressed with >>/<</& which
# parse identically in Spark SQL and DuckDB (verified): bit i of xb
# lands at 2i, bit i of yb at 2i+1.
_MORTON_EXPR = " + ".join(
    [f"(((xb >> {i}) & 1) << {2 * i})" for i in range(8)]
    + [f"(((yb >> {i}) & 1) << {2 * i + 1})" for i in range(8)]
)


@register(
    "ml_kendall_tau",
    """
    WITH pts AS (
      SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM customer GROUP BY c_nationkey
    ),
    prs AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS c,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS d,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM pts a JOIN pts b ON a.k < b.k
    ),
    agg AS (
      SELECT CAST((SELECT count(*) FROM pts) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(c) AS BIGINT) AS conc, CAST(sum(d) AS BIGINT) AS disc,
             CAST(sum(tx) AS BIGINT) AS n1, CAST(sum(ty) AS BIGINT) AS n2
      FROM prs
    )
    SELECT n, conc, disc,
           CAST(conc - disc AS DOUBLE)
             / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)) + 0
             AS tau_b
    FROM agg
    """,
)
def ml_kendall_tau(spark, sf_dir):
    """Kendall's tau-b (tie-corrected rank correlation) between
    per-nation customer count and total account balance — the robust
    ordinal-association statistic next to ml_spearman_corr (which
    ranks raw rows; tau here runs at the nation grain where the
    pairwise definition is exactly computable). The O(n^2) pair join
    is safe BY CONSTRUCTION: it runs on the nation-bounded aggregate
    (<=25 rows at any SF, since nations are a fixed dimension), so
    pairs are <=300 forever — the same bounded-domain argument as
    ml_cramers_v. Concordant/discordant/tie counts are exact integers
    (balances reduce to half-up cents first); tau-b = (C - D) /
    sqrt((n0-n1)(n0-n2)) is a single IEEE tree over them — identical
    cross-engine, shipped unrounded. Reference analog: none."""
    pts = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("y"),
        )
    )
    a, b = pts.alias("a"), pts.alias("b")
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    prs = a.join(b, F.col("a.k") < F.col("b.k")).select(
        F.when(dx * dy > 0, 1).otherwise(0).alias("c"),
        F.when(dx * dy < 0, 1).otherwise(0).alias("d"),
        (F.col("a.x") == F.col("b.x")).cast("int").alias("tx"),
        (F.col("a.y") == F.col("b.y")).cast("int").alias("ty"),
    )
    n = pts.count()
    agg = prs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("c").cast("long").alias("conc"),
        F.sum("d").cast("long").alias("disc"),
        F.sum("tx").cast("long").alias("n1"),
        F.sum("ty").cast("long").alias("n2"),
    )
    tau = (F.col("conc") - F.col("disc")).cast("double") / F.sqrt(
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n2")).cast("double")
    )
    return agg.select(
        F.lit(n).cast("long").alias("n"),
        "conc",
        "disc",
        (tau + 0).alias("tau_b"),
    )


@register(
    "ml_theil_sen_slope",
    """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - (SELECT min(CAST(ts AS DATE))
                                      FROM events) AS BIGINT) AS d,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    slopes AS (
      SELECT CAST(b.y - a.y AS DOUBLE) / (b.d - a.d) AS m
      FROM daily a JOIN daily b ON a.d < b.d
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           quantile_cont(m, 0.5) + 0 AS slope_cents_per_day
    FROM slopes
    """,
)
def ml_theil_sen_slope(spark, sf_dir):
    """Theil-Sen robust trend: the median of all pairwise slopes of
    the daily purchase-cents series — the breakdown-resistant
    alternative to the OLS slope (ml_ols_inference): a third of the
    days can be wild outliers without moving it. The quadratic pair
    set is CALENDAR-bounded (days choose 2 — ~66k pairs for a year,
    constant in SF since the time range is fixed; the data-sized work
    is the one partial-aggregable groupBy(day)). Exactness: daily
    masses are exact cents; each slope is ONE integer-ratio IEEE
    division (identical both engines); the median rides the proven
    Spark percentile() == DuckDB quantile_cont() interpolation pair
    on identical value multisets, shipped unrounded. Reference
    analog: the reference's trend features stop at window averages
    (project/database_and_model_tools.py:95-130)."""
    e = _t(spark, sf_dir, "events")
    mind = e.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mind))
        .select(
            F.datediff(F.col("ts").cast("date"), F.col("d0"))
            .cast("long")
            .alias("d"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.d") - F.col("a.d"))
        ).alias("m")
    )
    n_days = daily.count()
    return slopes.agg(
        F.lit(n_days).cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (F.expr("percentile(m, 0.5)") + 0).alias("slope_cents_per_day"),
    )


@register(
    "ext_zorder_cluster",
    f"""
    WITH b AS (
      SELECT least(CAST(floor(p_retailprice / 8) AS BIGINT), 255) AS xb,
             least(CAST(p_size AS BIGINT) * 5, 255) AS yb
      FROM part
    ),
    z AS (SELECT xb, yb, {_MORTON_EXPR} AS morton FROM b)
    SELECT morton >> 8 AS zbucket, CAST(count(*) AS BIGINT) AS n_parts,
           min(xb) AS min_xb, max(xb) AS max_xb,
           min(yb) AS min_yb, max(yb) AS max_yb,
           CAST((max(xb) - min(xb) + 1) * (max(yb) - min(yb) + 1)
                AS BIGINT) AS bbox_area
    FROM z GROUP BY 1
    """,
)
def ext_zorder_cluster(spark, sf_dir):
    """Z-order (Morton) clustering of parts on the two-dimensional
    (price-bucket, size-bucket) key — the data-layout operator behind
    Delta/Iceberg OPTIMIZE ZORDER: interleaving the bits of both
    8-bit bucket keys makes lexicographic Morton order preserve
    2-D locality, so files written in that order carry TIGHT min/max
    ranges on BOTH columns and the scan planner can skip on either
    predicate (the pruning mechanic ext_manifest_pruned_scan asserts
    for one dimension). The entry reports per-Morton-prefix (top 8
    bits) bounding boxes — exactly the zone-map rows a 100 TB layout
    would persist; bbox_area being small (vs the 65k full grid) IS
    the locality guarantee. All arithmetic is integer bit math
    (>>/<</& parse identically in Spark SQL and DuckDB — verified);
    one partial-aggregable groupBy. Reference analog: none (the
    reference relies on single-column B-trees, SURVEY row 6)."""
    p = _t(spark, sf_dir, "part")
    b = p.select(
        F.least(
            F.floor(F.col("p_retailprice") / 8).cast("long"), F.lit(255)
        ).alias("xb"),
        F.least(F.col("p_size").cast("long") * 5, F.lit(255)).alias("yb"),
    )
    z = b.select("xb", "yb", F.expr(_MORTON_EXPR).alias("morton"))
    return z.groupBy(
        F.expr("morton >> 8").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.min("xb").alias("min_xb"),
        F.max("xb").alias("max_xb"),
        F.min("yb").alias("min_yb"),
        F.max("yb").alias("max_yb"),
        (
            (F.max("xb") - F.min("xb") + 1) * (F.max("yb") - F.min("yb") + 1)
        )
        .cast("long")
        .alias("bbox_area"),
    )


@register(
    "llm_code_detect",
    """
    WITH f AS (
      SELECT source, lang, n_chars,
             length(text) - length(replace(text, ';', '')) AS n_semi,
             length(text) - length(replace(text, '{', ''))
               + length(text) - length(replace(text, '}', '')) AS n_brace,
             length(text) - length(replace(text, '=', '')) AS n_eq
      FROM documents
    ),
    s AS (
      SELECT source, lang,
             CASE WHEN (n_semi * 3 + n_brace * 4 + n_eq * 2) * 1000
                       >= n_chars * 8 THEN 1 ELSE 0 END AS is_code
      FROM f
    )
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_code) AS BIGINT) AS n_code,
           CAST(sum(is_code) AS DOUBLE) / count(*) + 0 AS code_rate
    FROM s GROUP BY source, lang
    """,
)
def llm_code_detect(spark, sf_dir):
    """Code-vs-prose detection — the routing screen an LLM data
    pipeline runs before language-specific cleaning/tokenization:
    weighted symbol densities (semicolons x3, braces x4, equals x2,
    per kilochar) against an integer threshold, rolled up per
    (source, lang). The classifier is ALL-integer arithmetic
    (char-class counts via length-difference, the llm_quality_score
    technique; the threshold comparison is cross-multiplied so no
    division happens at all); the only double is the final rate — one
    integer division. One narrow projection + one partial-aggregable
    groupBy: at 100 TB this is a single scan with no shuffle beyond
    the tiny (source, lang) rollup. Reference analog: none."""
    d = _t(spark, sf_dir, "documents")
    ln = F.length("text")

    def _cnt(ch):
        return ln - F.length(F.expr(f"replace(text, '{ch}', '')"))

    f = d.select(
        "source",
        "lang",
        "n_chars",
        _cnt(";").alias("n_semi"),
        (_cnt("{") + _cnt("}")).alias("n_brace"),
        _cnt("=").alias("n_eq"),
    )
    s = f.select(
        "source",
        "lang",
        (
            (F.col("n_semi") * 3 + F.col("n_brace") * 4 + F.col("n_eq") * 2)
            * 1000
            >= F.col("n_chars") * 8
        )
        .cast("int")
        .alias("is_code"),
    )
    return s.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_code").cast("long").alias("n_code"),
        (F.sum("is_code").cast("double") / F.count(F.lit(1)) + 0).alias(
            "code_rate"
        ),
    )


@register(
    "llm_embedding_outliers",
    """
    WITH base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT label, list(mv ORDER BY pos) AS cv FROM (
        SELECT label, pos, round(avg(v), 4) AS mv FROM (
          SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings
        ) GROUP BY label, pos
      ) GROUP BY label
    ),
    scored AS (
      SELECT b.vec_id, b.label,
             list_dot_product(b.v, b.v)
               - 2 * list_dot_product(b.v, c.cv)
               + list_dot_product(c.cv, c.cv) AS dist2
      FROM base b JOIN cent c USING (label)
    ),
    rn AS (
      SELECT label, vec_id, dist2,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist2 DESC, vec_id) AS r
      FROM scored
    )
    SELECT label, vec_id, dist2 + 0 AS dist2 FROM rn WHERE r <= 5
    """,
)
def llm_embedding_outliers(spark, sf_dir):
    """Per-label embedding outliers: the 5 vectors farthest (squared
    L2) from their label centroid — the mislabeled-example /
    dirty-cluster screen a curation pipeline runs after embedding
    (SemDeDup's inverse: find what does NOT belong). Centroids are
    elementwise means rounded to 4dp (the llm_embedding_centroids
    doctrine — decouples them from float partial-sum order) and join
    back BROADCAST (|labels| rows); dist2 expands as dot(v,v) -
    2*dot(v,c) + dot(c,c), where both engines fold the dot products
    left-to-right over the same arrays (the llm_cosine_topk parity
    pair), so the unrounded doubles match and the per-label top-5
    carries a (dist2 DESC, vec_id) total order. Scale shape: the
    corpus is scanned once and never shuffled on content — the only
    exchanges are the dim-keyed centroid rollup and the final
    per-label top-5 window on |labels| partitions. Reference analog:
    none."""
    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = (
        base.select(
            "label", F.posexplode("v").alias("pos", "val")
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 4).alias("mv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: s.getField("mv"),
            ).alias("cv")
        )
    )
    dot = "aggregate(zip_with({0}, {1}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    scored = base.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.expr(
            f"{dot.format('v', 'v')} - 2 * {dot.format('v', 'cv')} "
            f"+ {dot.format('cv', 'cv')}"
        ).alias("dist2"),
    )
    w = Window.partitionBy("label").orderBy(F.col("dist2").desc(), "vec_id")
    return (
        scored.select("label", "vec_id", "dist2", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= 5)
        .select("label", "vec_id", (F.col("dist2") + 0).alias("dist2"))
    )
