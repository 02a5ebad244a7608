"""Twenty-sixth extension batch (round 6, part 11): causal inference
for experimentation, paired-classifier testing, graph mixing
structure, and cross-lingual corpus hygiene.

- `ml_diff_in_diff`: difference-in-differences estimate of the
  treated segments' order-value shift — the workhorse quasi-
  experimental estimator. Four cell means from exact integer cents
  sums; the DID estimate is one IEEE formula over them.
- `ml_cuped_adjustment`: CUPED variance reduction (Deng et al. 2013)
  — theta = cov(pre, post)/var(pre) from exact DECIMAL(38,0) moment
  sums over per-customer pre/post cents; reports theta and the
  variance-reduction ratio (1 - rho^2), both single IEEE trees.
- `ml_mcnemar_test`: McNemar's paired test comparing two fixed
  classifiers on the same rows — discordant-pair counts are exact
  integers; the (corrected) statistic is one division.
- `graph_degree_assortativity`: degree assortativity (Pearson
  correlation of endpoint degrees over directed edge ends) on the
  co-purchase graph — exact integer moment sums, one IEEE formula.
- `llm_crosslingual_ngram_overlap`: directed word-3-gram containment
  between language sub-corpora — the cross-lingual contamination
  screen (shared boilerplate shows up as high overlap). Distinct
  shingle sets per lang, pairwise intersection over a shingle-keyed
  equi-join, |langs|^2-bounded output.

Determinism contract: every data-volume aggregate is an exact
integer / DECIMAL(38,0) moment sum; doubles are single fixed IEEE
formulas over them. Reference analog: none (extends the
experimentation, ML-eval, graph, and corpus-hygiene families)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t, register
from .registry_ext9 import _COPURCHASE_EDGES_SQL, _copurchase_edges

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"
_TREAT = "('AUTOMOBILE', 'BUILDING')"
_CUT = "1998-01-01"


@register(
    "ml_diff_in_diff",
    f"""
    WITH cells AS (
      SELECT CASE WHEN c.c_mktsegment IN {_TREAT} THEN 1 ELSE 0 END AS treated,
             CASE WHEN o.o_orderdate >= TIMESTAMP '{_CUT} 00:00:00'
                  THEN 1 ELSE 0 END AS post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CENTS.format(col="o.o_totalprice")}) AS BIGINT) AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END)
          AS m_t_pre,
        max(CASE WHEN treated = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
          AS m_t_post,
        max(CASE WHEN treated = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END)
          AS m_c_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
          AS m_c_post,
        CAST(sum(n) AS BIGINT) AS n_orders
      FROM cells
    )
    SELECT n_orders, m_t_pre, m_t_post, m_c_pre, m_c_post,
           (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did_estimate
    FROM wide
    """,
)
def ml_diff_in_diff(spark, sf_dir):
    """Difference-in-differences: treated = AUTOMOBILE/BUILDING
    segments, post = orders from {_CUT}; outcome = order cents. The
    four cell means come from exact integer (count, cents-sum) pairs
    — each mean is ONE double division, and the DID estimate
    (post-pre gap of treated minus control) is one fixed IEEE tree
    over the four means, shipped unrounded. The parallel-trends
    counterfactual is the control segments' shift. Scale: one join +
    4-cell partial-aggregable rollup. Reference analog: none (extends
    the ml_ab_ztest_conversion experimentation family to
    quasi-experiments)."""
    cells = (
        _t(spark, sf_dir, "orders")
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING").cast("int").alias("treated"),
            (F.col("o_orderdate") >= F.lit(_CUT).cast("timestamp")).cast("int").alias("post"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.expr(_CENTS.format(col="o_totalprice"))).cast("long").alias("s"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    wide = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), mean)).alias("m_t_pre"),
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), mean)).alias("m_t_post"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), mean)).alias("m_c_pre"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), mean)).alias("m_c_post"),
        F.sum("n").cast("long").alias("n_orders"),
    )
    return wide.select(
        "n_orders",
        "m_t_pre",
        "m_t_post",
        "m_c_pre",
        "m_c_post",
        (
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre"))
        ).alias("did_estimate"),
    )


@register(
    "ml_cuped_adjustment",
    f"""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '{_CUT} 00:00:00'
                  THEN {_CENTS.format(col="o_totalprice")} ELSE 0 END) AS BIGINT)
               AS x,
             CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '{_CUT} 00:00:00'
                  THEN {_CENTS.format(col="o_totalprice")} ELSE 0 END) AS BIGINT)
               AS y
      FROM orders GROUP BY o_custkey
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,0)) AS sx,
             CAST(sum(y) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM per_cust
    )
    SELECT n,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
             AS theta,
           ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
            * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n))
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))
             AS rho_squared
    FROM mo
    """,
)
def ml_cuped_adjustment(spark, sf_dir):
    """CUPED (Controlled-experiment Using Pre-Experiment Data):
    theta = cov(pre, post) / var(pre) over per-customer pre/post
    order cents, and the variance-reduction factor rho^2 (adjusted
    variance = (1 - rho^2) * var(post)) — the experimentation
    platform's standard sensitivity boost. Every moment (sx, sy,
    sxy, sxx, syy) accumulates EXACTLY in DECIMAL(38,0) (cents
    products ~1e16/row never overflow at any SF); theta and rho^2
    are single fixed IEEE trees over the exact moments, shipped
    unrounded. Scale: one groupBy(cust) + one 6-cell moment
    aggregate, both partial-aggregable. Reference analog: none
    (extends ml_ab_ztest_conversion)."""
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    cut = F.lit(_CUT).cast("timestamp")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(F.when(F.col("o_orderdate") < cut, cents).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("o_orderdate") >= cut, cents).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    d38 = "decimal(38,0)"
    mo = per_cust.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).cast(d38).alias("syy"),
    )
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast(
        "double"
    ) / F.col("n")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast(
        "double"
    ) / F.col("n")
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast(
        "double"
    ) / F.col("n")
    return mo.select(
        "n",
        (cxy / cxx).alias("theta"),
        ((cxy * cxy) / (cxx * cyy)).alias("rho_squared"),
    )


@register(
    "ml_mcnemar_test",
    f"""
    WITH preds AS (
      SELECT CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END AS a,
             CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS b,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END) AS BIGINT)
               AS only_a_right,
             CAST(sum(CASE WHEN b = y AND a <> y THEN 1 ELSE 0 END) AS BIGINT)
               AS only_b_right,
             CAST(sum(CASE WHEN a = y AND b = y THEN 1 ELSE 0 END) AS BIGINT)
               AS both_right,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM preds
    )
    SELECT only_a_right, only_b_right, both_right, n_rows,
           CAST((only_a_right - only_b_right) * (only_a_right - only_b_right)
                AS DOUBLE) / (only_a_right + only_b_right) AS mcnemar_chi2
    FROM cells
    """,
)
def ml_mcnemar_test(spark, sf_dir):
    """McNemar's paired test: do two fixed classifiers (quantity-rule
    vs discount-rule, both predicting returnflag) differ on the SAME
    rows? Only the discordant pairs matter: chi2 = (b - c)^2 /
    (b + c) over exact integer counts — one partial-aggregable scan,
    one division. The paired design is what makes comparing two
    models on one eval set statistically honest (vs two independent
    accuracy intervals). Reference analog: the reference compares
    two classifier families by bare accuracy
    (project/database_and_model_tools.py:141-164); this is the
    significance layer."""
    preds = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") <= 25).cast("int").alias("a"),
        (F.col("l_discount") >= 0.05).cast("int").alias("b"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    cells = preds.agg(
        F.sum(F.when((F.col("a") == F.col("y")) & (F.col("b") != F.col("y")), 1).otherwise(0))
        .cast("long")
        .alias("only_a_right"),
        F.sum(F.when((F.col("b") == F.col("y")) & (F.col("a") != F.col("y")), 1).otherwise(0))
        .cast("long")
        .alias("only_b_right"),
        F.sum(F.when((F.col("a") == F.col("y")) & (F.col("b") == F.col("y")), 1).otherwise(0))
        .cast("long")
        .alias("both_right"),
        F.count("*").cast("long").alias("n_rows"),
    )
    d = F.col("only_a_right") - F.col("only_b_right")
    return cells.select(
        "only_a_right",
        "only_b_right",
        "both_right",
        "n_rows",
        ((d * d).cast("double") / (F.col("only_a_right") + F.col("only_b_right"))).alias(
            "mcnemar_chi2"
        ),
    )


@register(
    "graph_degree_assortativity",
    f"""
    WITH {_COPURCHASE_EDGES_SQL},
    e AS MATERIALIZED (SELECT u, v FROM edges),
    deg AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ),
    ends AS (
      SELECT du.d AS x, dv.d AS y
      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
      UNION ALL
      SELECT dv.d AS x, du.d AS y
      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS DECIMAL(38,0)) AS sx,
             CAST(sum(y) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM ends
    )
    SELECT m AS n_edge_ends,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / m)
             / sqrt((CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / m)
                    * (CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / m))
             AS assortativity
    FROM mo
    """,
)
def graph_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all directed edge ends of the co-purchase
    graph — positive means hubs connect to hubs (social-style
    mixing), negative means hub-and-spoke. The symmetrized edge-end
    list makes the coefficient direction-free; all five moments are
    exact DECIMAL(38,0) integer sums; the coefficient is one IEEE
    formula with the variance product multiplied BEFORE the single
    sqrt (the ml_matthews_corrcoef tree discipline). Scale: two
    broadcast-able degree joins + one moment aggregate — all
    partial-aggregable; 3x replica per the graph-densification
    protocol. Reference analog: none (extends the graph family)."""
    e = _copurchase_edges(spark, sf_dir).select("u", "v").localCheckpoint()
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("d", "dx")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dy")
    joined = e.join(du, "u").join(dv, "v")
    ends = joined.select(F.col("dx").alias("x"), F.col("dy").alias("y")).unionAll(
        joined.select(F.col("dy").alias("x"), F.col("dx").alias("y"))
    )
    d38 = "decimal(38,0)"
    mo = ends.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).cast(d38).alias("syy"),
    )
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast(
        "double"
    ) / F.col("m")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast(
        "double"
    ) / F.col("m")
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast(
        "double"
    ) / F.col("m")
    return mo.select(
        F.col("m").alias("n_edge_ends"),
        (cxy / F.sqrt(cxx * cyy)).alias("assortativity"),
    )


@register(
    "llm_crosslingual_ngram_overlap",
    """
    WITH lg AS (
      SELECT DISTINCT lang,
             array_to_string(list_slice(ws, i, i + 2), ' ') AS shingle
      FROM (
        SELECT lang, ws,
               unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
        FROM (
          SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents
        )
      )
    ),
    sizes AS (SELECT lang, CAST(count(*) AS BIGINT) AS sz FROM lg GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM lg a JOIN lg b ON a.shingle = b.shingle AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT i.lang_a, i.lang_b, i.n_shared, sa.sz AS sz_a, sb.sz AS sz_b,
           CAST(i.n_shared AS DOUBLE) / least(sa.sz, sb.sz) AS containment
    FROM inter i
    JOIN sizes sa ON sa.lang = i.lang_a
    JOIN sizes sb ON sb.lang = i.lang_b
    ORDER BY lang_a, lang_b
    """,
)
def llm_crosslingual_ngram_overlap(spark, sf_dir):
    """Cross-lingual word-3-gram overlap between language sub-corpora
    — shared shingles across langs are contamination / boilerplate
    signals (true parallel text aside, distinct languages should
    share almost no exact 3-grams). Distinct shingles per lang (one
    explode, lang-keyed dedup), pairwise intersection via a
    shingle-keyed equi-join with lang_a < lang_b ordering — the
    intersection shuffle is keyed on shingle, so it scales with
    shared mass, not |A| x |B|; output is bounded by lang pairs.
    Containment = shared / min(|A|, |B|) is one division per pair.
    Scale: the same candidate-bounded shape as
    llm_ngram_containment, lifted from doc to lang grain. Reference
    analog: none (extends llm_decontaminate)."""
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    idx = F.explode(
        F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(1)))
    ).alias("i")
    lg = (
        _t(spark, sf_dir, "documents")
        .select("lang", words.alias("__ws"), idx)
        .select(
            "lang",
            F.array_join(F.slice(F.col("__ws"), F.col("i"), 3), " ").alias("shingle"),
        )
        .distinct()
    )
    sizes = lg.groupBy("lang").agg(F.count("*").cast("long").alias("sz"))
    a, b = lg.alias("a"), lg.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sa = sizes.withColumnRenamed("lang", "lang_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed("lang", "lang_b").withColumnRenamed("sz", "sz_b")
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_shared",
            "sz_a",
            "sz_b",
            (
                F.col("n_shared").cast("double")
                / F.least(F.col("sz_a"), F.col("sz_b"))
            ).alias("containment"),
        )
        .orderBy("lang_a", "lang_b")
    )
