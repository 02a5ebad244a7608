"""Tenth extension batch (round 5, batches 4-5): window-composition,
SQL-ML, and curation surfaces — running sums with event-triggered
resets, the decision-tree split search + its confusion-matrix
evaluation, lateral column aliases, SemDeDup-style semantic pruning,
codec-free audio window energy, incremental JOIN-view maintenance,
and PCA by power iteration.

No reference analog (/root/reference/project/db.py:77-475 has no
window functions at all); §2B extensions per the build mandate.
All exact-oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register
from .registry_ext2 import _views


@register(
    "ext_conditional_reset_cumsum",
    """
    WITH seg AS (
      SELECT event_id, user_id, value, ts,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg_id
      FROM events WHERE user_id < 50
    )
    SELECT event_id, user_id, CAST(seg_id AS BIGINT) AS seg_id,
           round(sum(value) OVER (PARTITION BY user_id, seg_id
                                  ORDER BY ts, event_id), 4)
             AS run_since_reset
    FROM seg
    """,
)
def ext_conditional_reset_cumsum(spark, sf_dir):
    """Running total with event-triggered resets (cumulative value
    since each user's last 'signup') — the two-stage window
    composition that expresses resettable accumulators without state:
    stage 1 derives a segment id as a running count of reset events,
    stage 2 runs the cumulative sum partitioned by (user, segment).
    Both windows sort by the same (ts, event_id) order; the second
    shuffle is keyed by a refinement of the first (user_id -> user_id,
    seg_id), so per-user data never crosses executors between stages.
    The streaming analog is stream_stateful_user_stats; this is the
    batch/backfill form."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "event_id",
        "user_id",
        "value",
        "ts",
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .over(w1)
        .alias("seg_id"),
    )
    w2 = Window.partitionBy("user_id", "seg_id").orderBy("ts", "event_id")
    return seg.select(
        "event_id",
        "user_id",
        F.col("seg_id").cast("long").alias("seg_id"),
        F.round(F.sum("value").over(w2), 4).alias("run_since_reset"),
    )


@register(
    "ml_decision_stump",
    """
    WITH labeled AS (
      SELECT l_quantity AS q, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    per_value AS (
      SELECT q, CAST(count(*) AS DOUBLE) AS n, CAST(sum(y) AS DOUBLE) AS pos
      FROM labeled GROUP BY q
    ),
    tot AS (SELECT sum(n) AS nt, sum(pos) AS post FROM per_value),
    cum AS (
      SELECT q,
             sum(n) OVER (ORDER BY q) AS nl,
             sum(pos) OVER (ORDER BY q) AS posl
      FROM per_value
    ),
    scored AS (
      SELECT q AS threshold,
             round(
               (nl / nt) * (1 - pow(posl / nl, 2) - pow((nl - posl) / nl, 2))
               + ((nt - nl) / nt) * (CASE WHEN nt - nl = 0 THEN 0
                   ELSE 1 - pow((post - posl) / (nt - nl), 2)
                        - pow(((nt - nl) - (post - posl)) / (nt - nl), 2) END),
               9) AS gini
      FROM cum CROSS JOIN tot
    ),
    best AS (
      SELECT threshold, gini,
             row_number() OVER (ORDER BY gini, threshold) AS rn
      FROM scored
    )
    SELECT round(threshold, 4) AS threshold, round(gini, 6) AS gini_weighted,
           (SELECT CAST(count(*) AS BIGINT) FROM per_value) AS n_candidates
    FROM best WHERE rn = 1
    """,
)
def ml_decision_stump(spark, sf_dir):
    """Decision-tree split search (best `q <= t` threshold on
    l_quantity for the returnflag label, by weighted Gini impurity) —
    the tree-induction inner loop as relational algebra, the shape
    distributed GBDT learners (XGBoost/LightGBM parity surface, M2/M3)
    evaluate per node: one partial-aggregable groupBy collapses the
    fact table to per-VALUE (count, positives) — after which every
    window/cumsum runs on the CANDIDATE table, bounded by distinct
    feature values (50 here; at 100 TB you'd pre-bin to 256 quantile
    buckets, same plan) — then prefix sums give every threshold's
    left/right class counts in one pass. Gini rounded 1e-9 before the
    argmin ranking (threshold tiebreak), per the float-trajectory
    discipline."""
    li = _t(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    best = _gini_best_split(labeled)
    return best.select(
        F.round("threshold", 4).alias("threshold"),
        F.round("gini", 6).alias("gini_weighted"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
    )


def _gini_best_split(labeled):
    """Shared Gini split search over a (q, y) frame: returns the 1-row
    argmin (threshold, gini rounded 1e-9, n_candidates). One partial-
    aggregable groupBy collapses facts to per-value counts; the cumsum
    window runs on the candidate table only."""
    per_value = labeled.groupBy("q").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y").cast("double").alias("pos"),
    )
    tot = per_value.agg(
        F.sum("n").alias("nt"), F.sum("pos").alias("post"), F.count("*").alias("n_candidates")
    )
    wcum = Window.orderBy("q")
    cum = per_value.select(
        "q",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("pos").over(wcum).alias("posl"),
    )
    s = cum.crossJoin(F.broadcast(tot))
    nl, posl = F.col("nl"), F.col("posl")
    nt, post = F.col("nt"), F.col("post")
    nr, posr = nt - nl, post - posl
    gini_l = 1 - F.pow(posl / nl, 2) - F.pow((nl - posl) / nl, 2)
    gini_r = F.when(nr == 0, 0.0).otherwise(
        1 - F.pow(posr / nr, 2) - F.pow((nr - posr) / nr, 2)
    )
    scored = s.select(
        F.col("q").alias("threshold"),
        F.round((nl / nt) * gini_l + (nr / nt) * gini_r, 9).alias("gini"),
        "n_candidates",
    )
    wbest = Window.orderBy("gini", "threshold")
    return scored.withColumn("rn", F.row_number().over(wbest)).filter(F.col("rn") == 1)


@register(
    "ext_lateral_column_alias",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS net_cents,
           CAST(round(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                      * l_tax) AS BIGINT) AS tax_cents,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             + CAST(round(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                          * l_tax) AS BIGINT) AS gross_cents
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def ext_lateral_column_alias(spark, sf_dir):
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing
    an alias defined earlier in the SAME select list (net_cents ->
    tax_cents -> gross_cents), saving the nested-subquery chain the
    oracle spells out by full expansion — which also proves the
    analyzer substitutes the alias EXPRESSION, not a snapshot. The
    physical plan is one Project over the pruned scan either way.
    Money math is integer cents throughout: rounding a double that
    both engines computed bit-identically is engine-invariant, while
    re-rounding already-rounded 4dp decimals lands exactly ON .5
    boundaries and diverged at the 10x replica. Registered through
    spark.sql because the alias-resolution path IS the surface under
    test."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 AS net_cents,
               CAST(round(net_cents * l_tax) AS BIGINT) AS tax_cents,
               net_cents + tax_cents AS gross_cents
        FROM lineitem WHERE l_orderkey < 100
        """
    )


@register(
    "llm_semdedup_prune",
    """
    WITH bb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN embedding[9] > 0 THEN 2 ELSE 0 END)
                + (CASE WHEN embedding[17] > 0 THEN 4 ELSE 0 END)
                + (CASE WHEN embedding[25] > 0 THEN 8 ELSE 0 END) AS INTEGER) AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS s
      FROM bb a JOIN bb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    thresholds AS (SELECT CAST(thr AS DOUBLE) AS thr
                   FROM (VALUES (0.30), (0.35), (0.40)) t(thr)),
    dropped AS (
      SELECT t.thr, p.idb AS vec
      FROM pairs p CROSS JOIN thresholds t
      WHERE p.s > t.thr
      GROUP BY t.thr, p.idb
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(vec_id) AS BIGINT) AS sum_ids
      FROM embeddings
    )
    SELECT t.thr AS threshold,
           tot.n_total,
           CAST(coalesce(count(d.vec), 0) AS BIGINT) AS n_dropped,
           tot.n_total - CAST(coalesce(count(d.vec), 0) AS BIGINT) AS n_kept,
           tot.sum_ids - CAST(coalesce(sum(d.vec), 0) AS BIGINT) AS sum_kept_ids
    FROM thresholds t CROSS JOIN tot LEFT JOIN dropped d ON d.thr = t.thr
    GROUP BY t.thr, tot.n_total, tot.sum_ids
    """,
)
def llm_semdedup_prune(spark, sf_dir):
    """SemDeDup-style semantic pruning: within each sign-LSH candidate
    bucket, drop every vector that has a LOWER-id neighbor above the
    cosine threshold (keep-first representative selection — the
    deterministic analog of the paper's keep-one-per-group), swept at
    three thresholds off ONE scored pair table. Candidates come from
    the same bucketing as llm_embedding_neardup (1/16th of the pair
    space); the sweep is a threshold cross join against the bounded
    pair set, never against the corpus, and retention is digested
    exactly (count + id-sum of keepers). Similarities are rounded 1e-6
    BEFORE thresholding so the keep/drop cut is engine-invariant.
    Per-vector norms are precomputed ONCE in the base projection and
    ride the join — recomputing norm(a)/norm(b) inside the pair
    expression re-folds 2 of the 3 64-element aggregates per pair and
    measured 2.4x slower at sf0.1; same floats either way (sqrt of the
    identical in-order dot), so the oracle is unchanged."""
    from .llm.similarity import _as_double, dot, norm, sign_bucket

    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        sign_bucket(F.col("embedding"), [1, 9, 17, 25]).alias("bucket"),
    ).withColumn("nrm", norm(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("b.vec_id").alias("idb"),
        F.round(
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
        ).alias("s"),
    )
    thresholds = spark.range(1).select(
        F.explode(F.array(F.lit(0.30), F.lit(0.35), F.lit(0.40))).alias("thr")
    )
    dropped = (
        pairs.crossJoin(F.broadcast(thresholds))
        .filter(F.col("s") > F.col("thr"))
        .select("thr", "idb")
        .distinct()
    )
    tot = e.agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("vec_id").cast("long").alias("sum_ids"),
    )
    agg = dropped.groupBy("thr").agg(
        F.count("*").cast("long").alias("n_dropped_raw"),
        F.sum("idb").cast("long").alias("sum_dropped_raw"),
    )
    return (
        thresholds.join(agg, "thr", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("thr").alias("threshold"),
            "n_total",
            F.coalesce(F.col("n_dropped_raw"), F.lit(0)).cast("long").alias("n_dropped"),
            (F.col("n_total") - F.coalesce(F.col("n_dropped_raw"), F.lit(0)))
            .cast("long")
            .alias("n_kept"),
            (F.col("sum_ids") - F.coalesce(F.col("sum_dropped_raw"), F.lit(0)))
            .cast("long")
            .alias("sum_kept_ids"),
        )
    )


@register(
    "llm_multimodal_audio_energy",
    """
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    samples AS (
      SELECT doc_id, gs.i AS i,
             CAST(((doc_id * 7919 + gs.i * 104729) % 4096) - 2048 AS DOUBLE) AS s
      FROM ids CROSS JOIN generate_series(0, 255) gs(i)
    )
    SELECT doc_id, CAST(i // 16 AS BIGINT) AS win,
           round(sqrt(avg(s * s)), 6) AS rms
    FROM samples GROUP BY doc_id, i // 16
    """,
)
def llm_multimodal_audio_energy(spark, sf_dir):
    """Audio-style multimodal processing with an EXACT oracle and no
    codec gate: 256 int16 PCM samples per asset are minted
    deterministically, packed to little-endian bytes in one Arrow
    mapInPandas batch (numpy int16 tobytes), then a second mapInPandas
    reinterprets the raw bytes (np.frombuffer) and computes per-16-
    sample-window RMS energy — the VAD/silence-trim feature shape of
    an audio curation pipeline. Both stages are narrow (no shuffle),
    batch-vectorized, and schema-typed (BinaryType in, flat frame
    out); the oracle recomputes the identical windows from the minting
    formula. Complements llm_multimodal_framesample (video) and the
    gated decode stub: here the BYTE PATH itself is proven
    end-to-end."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")

    def pack(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            out = []
            for did in ids:
                i = np.arange(256, dtype=np.int64)
                s = ((did * 7919 + i * 104729) % 4096 - 2048).astype("<i2")
                out.append(s.tobytes())
            yield pd.DataFrame({"doc_id": ids, "pcm": out})

    assets = d.mapInPandas(pack, "doc_id long, pcm binary")

    def rms(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows_id, rows_win, rows_rms = [], [], []
            for did, blob in zip(pdf["doc_id"], pdf["pcm"]):
                s = np.frombuffer(blob, dtype="<i2").astype(np.float64)
                w = s.reshape(-1, 16)
                e = np.sqrt((w * w).mean(axis=1))
                rows_id.extend([did] * w.shape[0])
                rows_win.extend(range(w.shape[0]))
                rows_rms.extend(np.round(e, 6))
            yield pd.DataFrame({"doc_id": rows_id, "win": rows_win, "rms": rows_rms})

    return assets.mapInPandas(rms, "doc_id long, win long, rms double")


@register(
    "ext_incremental_join_view",
    """
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def ext_incremental_join_view(spark, sf_dir):
    """Incremental maintenance of a JOIN view (revenue by nation over
    the 4-way lineitem-orders-customer-nation join): the maintained
    result is base partials (l_orderkey % 7 <> 0) union-MERGED with
    delta partials (% 7 = 0), each slice joined to the dims
    independently — and must equal the oracle's single-pass join-
    aggregate. This is the join-IVM sibling of ext_incremental_rollup:
    because the view's measures are re-aggregable (count, integer-cent
    sum) and the join is against slowly-changing dims, appending a
    delta costs one delta-sized join + a tiny partials merge, never a
    100 TB re-join. Dims ride broadcast joins in both slice plans;
    revenue is integer cents so the merge is exact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )

    def partial(facts):
        return (
            facts.select("l_orderkey", cents.alias("cents"))
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_items"), F.sum("cents").alias("revenue_cents"))
        )

    base = partial(li.filter(F.col("l_orderkey") % 7 != 0))
    delta = partial(li.filter(F.col("l_orderkey") % 7 == 0))
    return (
        base.unionByName(delta)
        .groupBy("n_name")
        .agg(
            F.sum("n_items").cast("long").alias("n_items"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
        .select(F.col("n_name").alias("nation"), "n_items", "revenue_cents")
    )


_PCA_ITER_SQL = """
w{n} AS (
  SELECT c.i, round(sum(c.cv * v.val), 9) AS wv
  FROM cmat c JOIN {v} v ON c.j = v.i GROUP BY c.i
),
n{n} AS (SELECT round(sqrt(sum(wv * wv)), 9) AS nrm FROM w{n}),
v{n} AS (SELECT i, wv / nrm AS val FROM w{n} CROSS JOIN n{n})
"""


@register(
    "ml_pca_power_iteration",
    f"""
    WITH long AS (
      SELECT vec_id, gs.i AS i, CAST(embedding[gs.i] AS DOUBLE) AS x
      FROM embeddings CROSS JOIN generate_series(1, 16) gs(i)
    ),
    mu AS (SELECT i, round(avg(x), 9) AS m FROM long GROUP BY i),
    cen AS (SELECT l.vec_id, l.i, l.x - m.m AS xc FROM long l JOIN mu m ON l.i = m.i),
    cmat AS (
      SELECT a.i AS i, b.i AS j, round(avg(a.xc * b.xc), 9) AS cv
      FROM cen a JOIN cen b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ),
    v0 AS (SELECT gs.i AS i, 0.25 AS val FROM generate_series(1, 16) gs(i)),
    {_PCA_ITER_SQL.format(n=1, v="v0")},
    {_PCA_ITER_SQL.format(n=2, v="v1")},
    {_PCA_ITER_SQL.format(n=3, v="v2")},
    ray AS (
      SELECT round(sum(v3a.val * c.cv * v3b.val), 6) AS eig
      FROM cmat c JOIN v3 v3a ON c.i = v3a.i JOIN v3 v3b ON c.j = v3b.i
    )
    SELECT CAST(16 AS BIGINT) AS n_dims, ray.eig AS top_eigenvalue,
           round(abs((SELECT val FROM v3 WHERE i = 1)), 6) AS c1,
           round(abs((SELECT val FROM v3 WHERE i = 2)), 6) AS c2,
           round(abs((SELECT val FROM v3 WHERE i = 3)), 6) AS c3
    FROM ray
    """,
)
def ml_pca_power_iteration(spark, sf_dir):
    """PCA top component by 3 fixed power iterations over the first 16
    embedding dims — distributed iterative linear algebra in
    relational form: ONE data-sized shuffle builds the d x d
    covariance (pair-exploded, partial-aggregable avg; d^2 = 256
    groups), after which every iterate (matvec, norm, Rayleigh
    quotient) runs on the TINY C/v tables — exactly how a cluster PCA
    separates the O(n d^2) sufficient-statistics pass from the O(d^2)
    eigensolve (MLlib computeSVD does the same Gramian collapse).
    Matvec sums and norms are rounded 1e-9 per step (the pinned-
    trajectory discipline), so both engines walk identical iterates.
    Fixed iterations, not convergence: random embeddings have a flat
    spectrum, so the 3-step estimate undershoots the true eigenvalue
    — the semantics pinned here are the STEP, as with
    ml_logistic_regression_gd."""
    emb = _t(spark, sf_dir, "embeddings")
    long = emb.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, 16)).alias(
            "pos", "x"
        ),
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "x")
    mu = long.groupBy("i").agg(F.round(F.avg("x"), 9).alias("m"))
    cen = long.join(F.broadcast(mu), "i").select(
        "vec_id", "i", (F.col("x") - F.col("m")).alias("xc")
    )
    a, b = cen.alias("a"), cen.alias("b")
    cmat = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.round(F.avg(F.col("a.xc") * F.col("b.xc")), 9).alias("cv"))
    )
    v = spark.range(1, 17).select(F.col("id").alias("i"), F.lit(0.25).alias("val"))
    for _ in range(3):
        w = (
            cmat.join(F.broadcast(v.withColumnRenamed("i", "j")), "j")
            .groupBy("i")
            .agg(F.round(F.sum(F.col("cv") * F.col("val")), 9).alias("wv"))
        )
        nrm = w.agg(F.round(F.sqrt(F.sum(F.col("wv") * F.col("wv"))), 9).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("wv") / F.col("nrm")).alias("val")
        )
    va = v.select(F.col("i").alias("ri"), F.col("val").alias("va"))
    vb = v.select(F.col("i").alias("rj"), F.col("val").alias("vb"))
    ray = (
        cmat.join(F.broadcast(va), cmat.i == va.ri)
        .join(F.broadcast(vb), cmat.j == vb.rj)
        .agg(F.round(F.sum(F.col("va") * F.col("cv") * F.col("vb")), 6).alias("eig"))
    )
    comps = v.agg(
        F.round(F.abs(F.max(F.when(F.col("i") == 1, F.col("val")))), 6).alias("c1"),
        F.round(F.abs(F.max(F.when(F.col("i") == 2, F.col("val")))), 6).alias("c2"),
        F.round(F.abs(F.max(F.when(F.col("i") == 3, F.col("val")))), 6).alias("c3"),
    )
    return (
        ray.crossJoin(comps)
        .select(
            F.lit(16).cast("long").alias("n_dims"),
            F.col("eig").alias("top_eigenvalue"),
            "c1",
            "c2",
            "c3",
        )
    )


_GINI_SQL_CTES = """
per_value AS (
  SELECT q, CAST(count(*) AS DOUBLE) AS n, CAST(sum(y) AS DOUBLE) AS pos
  FROM labeled GROUP BY q
),
tot AS (SELECT sum(n) AS nt, sum(pos) AS post FROM per_value),
cum AS (
  SELECT q, sum(n) OVER (ORDER BY q) AS nl, sum(pos) OVER (ORDER BY q) AS posl
  FROM per_value
),
scored AS (
  SELECT q AS threshold,
         round(
           (nl / nt) * (1 - pow(posl / nl, 2) - pow((nl - posl) / nl, 2))
           + ((nt - nl) / nt) * (CASE WHEN nt - nl = 0 THEN 0
               ELSE 1 - pow((post - posl) / (nt - nl), 2)
                    - pow(((nt - nl) - (post - posl)) / (nt - nl), 2) END),
           9) AS gini
  FROM cum CROSS JOIN tot
),
best AS (
  SELECT threshold FROM (
    SELECT threshold, row_number() OVER (ORDER BY gini, threshold) AS rn FROM scored
  ) WHERE rn = 1
)
"""


@register(
    "ml_confusion_matrix",
    f"""
    WITH labeled AS (
      SELECT l_quantity AS q,
             CASE WHEN l_quantity + (l_orderkey % 11) - 5 > 25 THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    {_GINI_SQL_CTES},
    conf AS (
      SELECT CAST(sum(CASE WHEN l.q > b.threshold AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN l.q > b.threshold AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN l.q <= b.threshold AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(sum(CASE WHEN l.q <= b.threshold AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM labeled l CROSS JOIN best b
    )
    SELECT round(b.threshold, 4) AS threshold, c.tp, c.fp, c.tn, c.fn,
           round(CAST(c.tp AS DOUBLE) / (c.tp + c.fp), 6) AS precision_pos,
           round(CAST(c.tp AS DOUBLE) / (c.tp + c.fn), 6) AS recall_pos,
           round(2.0 * c.tp / (2.0 * c.tp + c.fp + c.fn), 6) AS f1_pos
    FROM best b CROSS JOIN conf c
    """,
)
def ml_confusion_matrix(spark, sf_dir):
    """Classification evaluation metrics — confusion matrix +
    precision/recall/F1 for the learned stump rule `predict positive
    iff q > t*` — the eval half of a train/evaluate loop, fully in
    relational algebra: t* comes from the shared Gini search
    (_gini_best_split), then ONE labeled-table scan against the
    broadcast 1-row threshold produces all four confusion cells as
    conditional sums; ratios are derived at the end (never stored
    unrounded intermediates). The label is a deterministic noisy
    threshold on the feature (testdata columns are mutually
    independent, so no natural pair separates) — the pipeline under
    test is the metric computation, and the ~0.94 F1 keeps every cell
    and ratio non-degenerate."""
    li = _t(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_quantity") + (F.col("l_orderkey") % 11) - 5 > 25, 1)
        .otherwise(0)
        .alias("y"),
    )
    best = _gini_best_split(labeled).select("threshold")
    d = labeled.crossJoin(F.broadcast(best))
    q, y, t = F.col("q"), F.col("y"), F.col("threshold")
    conf = d.agg(
        F.first("threshold").alias("t"),
        F.sum(F.when((q > t) & (y == 1), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((q > t) & (y == 0), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((q <= t) & (y == 0), 1).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when((q <= t) & (y == 1), 1).otherwise(0)).cast("long").alias("fn"),
    )
    tp, fp, tn, fn = F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn")
    return conf.select(
        F.round("t", 4).alias("threshold"),
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision_pos"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall_pos"),
        F.round(2.0 * tp / (2.0 * tp + fp + fn), 6).alias("f1_pos"),
    )


@register(
    "ext_source_binaryfile",
    """
    SELECT CAST(gs.i AS BIGINT) AS doc_id,
           CAST(32 AS BIGINT) AS n_bytes,
           md5(md5(CAST(gs.i AS VARCHAR))) AS content_md5
    FROM generate_series(0, 19) gs(i)
    """,
)
def ext_source_binaryfile(spark, sf_dir):
    """`binaryFile` source — the object-store ingestion path for
    multimodal corpora (images/audio land as opaque files; Spark lists
    them distributed and yields (path, modificationTime, length,
    content) with the CONTENT column lazily read per file). Fixture:
    20 files minted driver-side, each holding the 32-byte ascii md5 of
    its id; the entry reads them back through the format (with a
    pathGlobFilter, the listing-side predicate) and digests content —
    the oracle recomputes both digest layers from the minting formula,
    so a corrupted read changes the hash. At 100 TB this scan
    parallelizes per file and prunes on path; pair with
    llm_multimodal_* for the decode stages."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="binsrc_")
    import hashlib

    for i in range(20):
        with open(os.path.join(d, f"{i}.bin"), "wb") as f:
            f.write(hashlib.md5(str(i).encode()).hexdigest().encode())
    # decoy that the glob filter must exclude
    with open(os.path.join(d, "ignore.txt"), "wb") as f:
        f.write(b"not a bin")
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    return files.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@register(
    "ext_merge_schema_evolution",
    """
    WITH old_batch AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(NULL AS VARCHAR) AS etype
      FROM events WHERE event_id % 2 = 0
    ),
    new_batch AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
             event_type AS etype
      FROM events WHERE event_id % 2 = 1
    ),
    unioned AS (SELECT * FROM old_batch UNION ALL SELECT * FROM new_batch)
    SELECT coalesce(etype, '<pre-evolution>') AS etype,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(CASE WHEN etype IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing
    FROM unioned GROUP BY 1
    """,
)
def ext_merge_schema_evolution(spark, sf_dir):
    """Parquet schema evolution on read: an old batch written WITHOUT
    the `etype` column and a new batch written WITH it live in one
    table directory; `mergeSchema=true` unions the footers so old
    files surface NULL for the added column — the append-only
    evolution path a long-lived 100 TB table actually takes (no
    rewrite of historical files; the merge cost is per-FOOTER, not
    per-row, and schema-stable tables should pin the schema instead).
    The read-back rollup groups by the evolved column with a sentinel
    for pre-evolution rows; the oracle recomputes it from the logical
    source, so a wrong null-fill or dropped file changes the hash."""
    import tempfile

    path = tempfile.mkdtemp(prefix="evolve_") + "/t"
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_type",
    )
    e.filter(F.col("event_id") % 2 == 0).select("event_id", "cents").write.mode(
        "append"
    ).parquet(path)
    e.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "cents", F.col("event_type").alias("etype")
    ).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy(
        F.coalesce(F.col("etype"), F.lit("<pre-evolution>")).alias("etype")
    ).agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.when(F.col("etype").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
    )


@register(
    "ext_identifier_clause",
    """
    SELECT event_type, count(*) AS n,
           round(sum(value), 4) AS total
    FROM events
    WHERE user_id < 100
    GROUP BY event_type
    """,
)
def ext_identifier_clause(spark, sf_dir):
    """IDENTIFIER(:param) clause (Spark 3.4+): table AND column names
    templated through bind parameters — the injection-safe form of the
    f-string table/metric dispatch a multi-tenant query service does
    (the reference's method-per-query class dispatches on exactly such
    strings, project/db.py:187-250). Names resolve during analysis, so
    the plan is byte-identical to the hardcoded oracle form: same
    pushdown, same partial aggregate."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type, count(*) AS n,
               round(sum(IDENTIFIER(:metric)), 4) AS total
        FROM IDENTIFIER(:tbl)
        WHERE IDENTIFIER(:keycol) < :lo
        GROUP BY event_type
        """,
        args={"tbl": "events", "metric": "value", "keycol": "user_id", "lo": 100},
    )


_GINI_TPL = """
per_value{p} AS (
  SELECT q, CAST(count(*) AS DOUBLE) AS n, CAST(sum(y) AS DOUBLE) AS pos
  FROM {src} GROUP BY q
),
tot{p} AS (SELECT sum(n) AS nt, sum(pos) AS post FROM per_value{p}),
cum{p} AS (
  SELECT q, sum(n) OVER (ORDER BY q) AS nl, sum(pos) OVER (ORDER BY q) AS posl
  FROM per_value{p}
),
scored{p} AS (
  SELECT q AS threshold,
         round(
           (nl / nt) * (1 - pow(posl / nl, 2) - pow((nl - posl) / nl, 2))
           + ((nt - nl) / nt) * (CASE WHEN nt - nl = 0 THEN 0
               ELSE 1 - pow((post - posl) / (nt - nl), 2)
                    - pow(((nt - nl) - (post - posl)) / (nt - nl), 2) END),
           9) AS gini
  FROM cum{p} CROSS JOIN tot{p}
),
best{p} AS (
  SELECT threshold, gini FROM (
    SELECT threshold, gini, row_number() OVER (ORDER BY gini, threshold) AS rn
    FROM scored{p}
  ) WHERE rn = 1
)
"""


@register(
    "ml_decision_tree_depth2",
    f"""
    WITH labeled AS (
      SELECT l_quantity AS q,
             CASE WHEN l_quantity + (l_orderkey % 11) - 5 > 25 THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    {_GINI_TPL.format(p="0", src="labeled")},
    left_rows AS (
      SELECT l.q, l.y FROM labeled l CROSS JOIN best0 b WHERE l.q <= b.threshold
    ),
    right_rows AS (
      SELECT l.q, l.y FROM labeled l CROSS JOIN best0 b WHERE l.q > b.threshold
    ),
    {_GINI_TPL.format(p="1", src="left_rows")},
    {_GINI_TPL.format(p="2", src="right_rows")}
    SELECT 'root' AS node, round(threshold, 4) AS threshold,
           round(gini, 6) AS gini_weighted,
           (SELECT CAST(count(*) AS BIGINT) FROM labeled) AS n_rows
    FROM best0
    UNION ALL
    SELECT 'left', round(threshold, 4), round(gini, 6),
           (SELECT CAST(count(*) AS BIGINT) FROM left_rows)
    FROM best1
    UNION ALL
    SELECT 'right', round(threshold, 4), round(gini, 6),
           (SELECT CAST(count(*) AS BIGINT) FROM right_rows)
    FROM best2
    """,
)
def ml_decision_tree_depth2(spark, sf_dir):
    """Depth-2 decision-tree induction: the root split (shared Gini
    search) partitions the data, then each CHILD runs the identical
    search on its subset — the recursive step that turns the stump
    into tree learning, still pure relational algebra. Per level this
    is how distributed GBDT grows trees: one pass builds per-(node,
    value) sufficient statistics, the candidate-bounded argmin runs
    per node; here the two child searches share the root threshold via
    a broadcast 1-row join, and nothing driver-side ever sees data —
    only the 3 winning (node, threshold, gini) rows come back."""
    li = _t(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_quantity") + (F.col("l_orderkey") % 11) - 5 > 25, 1)
        .otherwise(0)
        .alias("y"),
    )
    root = _gini_best_split(labeled)
    t0 = F.broadcast(root.select(F.col("threshold").alias("t0")))
    left = labeled.crossJoin(t0).filter(F.col("q") <= F.col("t0")).select("q", "y")
    right = labeled.crossJoin(t0).filter(F.col("q") > F.col("t0")).select("q", "y")

    def node_row(name, subset):
        best = _gini_best_split(subset).select(
            F.lit(name).alias("node"),
            F.round("threshold", 4).alias("threshold"),
            F.round("gini", 6).alias("gini_weighted"),
        )
        n = subset.agg(F.count("*").cast("long").alias("n_rows"))
        return best.crossJoin(F.broadcast(n))

    return (
        node_row("root", labeled)
        .unionByName(node_row("left", left))
        .unionByName(node_row("right", right))
    )
