"""Twenty-fifth extension batch (round 6, part 10): training-prep
encodings, seq2seq masking, graph local structure, tokenizer
diagnostics, and data-scaling curves.

- `ml_target_encoding_loo`: leave-one-out target encoding of market
  segment against order cents — the high-cardinality categorical
  encoder that avoids self-leakage by excluding each row's own
  target from its category mean. The LOO value is computed as an
  EXACT e4 integer ((S - c) * 10000 DIV (n - 1)), so banding it is
  safe at any SF.
- `llm_span_corruption`: T5-style deterministic span-corruption
  masks — span starts chosen by md5 bucket of (doc, pos), spans run
  3 tokens, overlaps merge; reports token/mask/span counts and the
  realized mask ratio. The mask decision is a windowed any-start-
  within-lookback test — all integers.
- `graph_clustering_coefficient`: per-node clustering coefficient
  (triangles at the node / wedges at the node) over the co-purchase
  graph, reported as integer-banded histogram — local density, the
  companion to the global graph_triangle_count.
- `llm_tokenizer_fertility`: subword-per-word fertility by language
  (alnum-run tokenizer vs whitespace words) — the tokenizer-quality
  screen a multilingual corpus needs. Integer sums, one division per
  language.
- `ml_learning_curve`: stump accuracy as a function of training-set
  size (md5-deterministic 10%/30%/100% subsets, evaluated on the
  held-out ~20% test split) — the data-scaling diagnostic that
  decides whether more data beats more model. Integer-exact
  training argmax and integer test accuracy.

Determinism contract: all aggregates over data volume are exact
integers (cents, md5 buckets, counts, triangle/wedge counts); the
only doubles are single end divisions. Reference analog: none
(extends the training-prep / corpus / graph / ML-eval families)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t, register
from .llm.prep import md5_bucket
from .registry_ext9 import _COPURCHASE_EDGES_SQL, _copurchase_edges

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


@register(
    "ml_target_encoding_loo",
    f"""
    WITH base AS (
      SELECT c.c_mktsegment AS seg,
             {_CENTS.format(col="o.o_totalprice")} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    stats AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM base GROUP BY seg
    ),
    enc AS (
      SELECT b.seg,
             ((st.s - b.cents) * 10000) // (st.n - 1) AS loo_e4
      FROM base b JOIN stats st ON b.seg = st.seg
      WHERE st.n > 1
    )
    SELECT seg, loo_e4 // 10000000 AS loo_band,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(loo_e4) AS BIGINT) AS min_loo_e4,
           CAST(max(loo_e4) AS BIGINT) AS max_loo_e4
    FROM enc GROUP BY seg, loo_e4 // 10000000
    ORDER BY seg, loo_band
    """,
)
def ml_target_encoding_loo(spark, sf_dir):
    """Leave-one-out target encoding: each row's categorical feature
    value becomes the mean target of its category EXCLUDING the row
    itself — (S_cat - cents) / (n_cat - 1) — the leakage-safe
    high-cardinality encoder (plain target encoding would leak each
    row's own label into its feature; the LOO form is what sklearn's
    TargetEncoder and CatBoost's ordered boosting approximate).
    Exactness: the encoding is computed as an EXACT e4 integer via
    truncating division (Spark DIV / DuckDB //, both toward zero —
    operands are positive), so the band histogram is exact at any
    SF — no float banding boundary anywhere. Scale: one join +
    groupBy to the 5-row stats table broadcast back; the encode pass
    is narrow. Reference analog: reference label-encodes categoricals
    (project/database_and_model_tools.py:96-112); this is the
    target-aware upgrade."""
    base = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
        )
    )
    stats = base.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"), F.sum("cents").cast("long").alias("s")
    )
    enc = (
        base.join(F.broadcast(stats), "seg")
        .where(F.col("n") > 1)
        .select(
            "seg",
            F.expr("((s - cents) * 10000) DIV (n - 1)").alias("loo_e4"),
        )
    )
    return (
        enc.groupBy("seg", F.expr("loo_e4 DIV 10000000").alias("loo_band"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("loo_e4").cast("long").alias("min_loo_e4"),
            F.max("loo_e4").cast("long").alias("max_loo_e4"),
        )
        .orderBy("seg", "loo_band")
    )


_SPAN_LEN = 3
_MASK_BUCKETS = 13  # ~5% of 256 -> span starts; x3 length ~ 15% mask rate
_HEXPOS = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"


@register(
    "llm_span_corruption",
    f"""
    WITH toks AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id,
               generate_subscripts(list_filter(string_split(text, ' '),
                                               x -> x <> ''), 1) AS pos
        FROM documents
      )
    ),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN (({_HEXPOS.format(p=1)}) * 16
                        + ({_HEXPOS.format(p=2)})) < {_MASK_BUCKETS}
                  THEN 1 ELSE 0 END AS is_start
      FROM (
        SELECT doc_id, pos,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)) AS h
        FROM toks
      )
    ),
    masked AS (
      SELECT doc_id, pos, is_start,
             CASE WHEN max(is_start) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN {_SPAN_LEN - 1} PRECEDING AND CURRENT ROW) = 1
                  THEN 1 ELSE 0 END AS m
      FROM flagged
    ),
    runs AS (
      SELECT doc_id, pos, m,
             CASE WHEN m = 1 AND coalesce(lag(m) OVER (PARTITION BY doc_id
                    ORDER BY pos), 0) = 0 THEN 1 ELSE 0 END AS run_start
      FROM masked
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(m) AS BIGINT) AS n_masked,
           CAST(sum(run_start) AS BIGINT) AS n_spans,
           CAST(sum(m) AS DOUBLE) / count(*) AS mask_ratio
    FROM runs
    """,
)
def llm_span_corruption(spark, sf_dir):
    """T5-style span-corruption mask generation, fully deterministic:
    a token position starts a span iff its md5(doc:pos) first byte
    falls under the ~5% threshold; spans cover {_SPAN_LEN} tokens and
    overlapping spans merge (realized mask rate ~15%). The mask test
    is a bounded-lookback window max (any span start within the last
    {_SPAN_LEN} positions); maximal masked runs are counted by the
    run-start flank (m rises 0->1) — the seq2seq denoising-objective
    prep (Raffel et al. 2020) with no RNG, so shards regenerate the
    SAME masks on any engine or cluster. Scale: one explode
    (positions only — the token text never ships), two narrow
    windows partitioned by doc, then a 4-cell aggregate. Reference
    analog: none (extends llm_chunk_documents / llm_pack_sequences
    training-prep family)."""
    w_all = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(w_all).alias("pos0", "w0"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"))
    )
    flagged = toks.select(
        "doc_id",
        "pos",
        (
            md5_bucket(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                ),
                n_digits=2,
            )
            < _MASK_BUCKETS
        )
        .cast("int")
        .alias("is_start"),
    )
    wm = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_SPAN_LEN - 1), Window.currentRow)
    )
    masked = flagged.select(
        "doc_id",
        "pos",
        (F.max("is_start").over(wm) == 1).cast("int").alias("m"),
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    runs = masked.select(
        "m",
        (
            (F.col("m") == 1)
            & (F.coalesce(F.lag("m").over(wl), F.lit(0)) == 0)
        )
        .cast("int")
        .alias("run_start"),
    )
    return runs.agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("m").cast("long").alias("n_masked"),
        F.sum("run_start").cast("long").alias("n_spans"),
        (F.sum("m").cast("double") / F.count("*")).alias("mask_ratio"),
    )


@register(
    "graph_clustering_coefficient",
    f"""
    WITH {_COPURCHASE_EDGES_SQL},
    e AS MATERIALIZED (SELECT u, v FROM edges),
    deg AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ),
    tri AS MATERIALIZED (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pertri AS (
      SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri
      ) GROUP BY node
    ),
    coef AS (
      SELECT d.node, coalesce(p.t, 0) AS t, d.d,
             (coalesce(p.t, 0) * 2 * 10) // (d.d * (d.d - 1)) AS band
      FROM deg d LEFT JOIN pertri p ON d.node = p.node
      WHERE d.d >= 2
    )
    SELECT CAST(band AS BIGINT) AS coef_band,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(t) AS BIGINT) AS triangle_mass,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM coef GROUP BY band ORDER BY coef_band
    """,
)
def graph_clustering_coefficient(spark, sf_dir):
    """Per-node clustering coefficient histogram over the co-purchase
    graph: coefficient = 2*tri(v) / (deg(v)*(deg(v)-1)), banded as the
    EXACT integer (20*tri) DIV (deg*(deg-1)) (10 bands, no float
    boundary). Triangles-at-node come from the same ordered-triple
    wedge join as graph_triangle_count, exploded to all three corners
    — the intermediate stays Sum(deg_in*deg_out)-bounded on the
    sparse-by-construction graph. Nodes of degree < 2 (undefined
    coefficient) are excluded, matching NetworkX. Scale: two
    equi-joins + three partial-aggregable groupBys; the same shape
    GraphX's LocalClusteringCoefficient shuffles. Reference analog:
    none (local companion to graph_triangle_count)."""
    e = _copurchase_edges(spark, sf_dir).select("u", "v").localCheckpoint()
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    )
    pertri = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("t"))
    )
    coef = (
        deg.join(pertri, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("t"), F.lit(0)).alias("t"),
            "d",
        )
        .where(F.col("d") >= 2)
        .withColumn("band", F.expr("(t * 2 * 10) DIV (d * (d - 1))"))
    )
    return (
        coef.groupBy(F.col("band").cast("long").alias("coef_band"))
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("t").cast("long").alias("triangle_mass"),
            F.min("d").cast("long").alias("min_degree"),
            F.max("d").cast("long").alias("max_degree"),
        )
        .orderBy("coef_band")
    )


@register(
    "llm_tokenizer_fertility",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(len(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS BIGINT)) AS BIGINT)
             AS n_words,
           CAST(sum(CAST(len(list_filter(string_split_regex(lower(text),
                                                            '[^a-z0-9]+'),
                                          x -> x <> '')) AS BIGINT)) AS BIGINT)
             AS n_subwords,
           CAST(sum(CAST(len(list_filter(string_split_regex(lower(text),
                                                            '[^a-z0-9]+'),
                                          x -> x <> '')) AS BIGINT)) AS DOUBLE)
             / sum(CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                        AS BIGINT)) AS fertility
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def llm_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility (subword pieces per whitespace word) by
    language — the multilingual-equity diagnostic: languages whose
    fertility is far above the corpus norm pay more sequence length
    per word (Rust et al. 2021). Piece counts use the alnum-run
    tokenizer (the llm_token_counts pair); word and piece counts are
    exact integers summed per language; fertility is ONE division per
    language row. Scale: one scan, partial-aggregable. Reference
    analog: none (extends llm_token_counts)."""
    t = F.col("text")
    words = F.size(F.filter(F.split(t, " "), lambda x: x != F.lit(""))).cast("long")
    subwords = F.size(
        F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    ).cast("long")
    d = _t(spark, sf_dir, "documents").select(
        "lang", words.alias("w"), subwords.alias("sw")
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("sw").cast("long").alias("n_subwords"),
            (F.sum("sw").cast("double") / F.sum("w")).alias("fertility"),
        )
        .orderBy("lang")
    )


_CURVE_FRACTIONS = [25, 77, 256]  # md5-bucket thresholds: ~10%, ~30%, 100%


def _curve_oracle() -> str:
    # train buckets: md5(rid) byte < 205 is train (the llm_train_test
    # _split constant); within train, subset via a SECOND md5 salt
    per_frac = []
    for fb in _CURVE_FRACTIONS:
        per_frac.append(
            f"""
    pv_{fb} AS (
      SELECT q, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      FROM labeled
      WHERE split_b < 205 AND sub_b < {fb}
      GROUP BY q
    ),
    tt_{fb} AS (SELECT sum(n) AS nt, sum(pos) AS post,
                       CAST(sum(n) AS BIGINT) AS n_train FROM pv_{fb}),
    best_{fb} AS (
      SELECT threshold, left_pred, right_pred, n_train FROM (
        SELECT c.q AS threshold, tt.n_train,
               greatest(c.posl, c.nl - c.posl)
                 + greatest(tt.post - c.posl,
                            (tt.nt - c.nl) - (tt.post - c.posl)) AS correct,
               CASE WHEN c.posl * 2 >= c.nl THEN 1 ELSE 0 END AS left_pred,
               CASE WHEN (tt.post - c.posl) * 2 >= (tt.nt - c.nl)
                    THEN 1 ELSE 0 END AS right_pred,
               row_number() OVER (ORDER BY greatest(c.posl, c.nl - c.posl)
                 + greatest(tt.post - c.posl,
                            (tt.nt - c.nl) - (tt.post - c.posl)) DESC,
                 c.q) AS rn
        FROM (
          SELECT q,
                 sum(n) OVER (ORDER BY q) AS nl,
                 sum(pos) OVER (ORDER BY q) AS posl
          FROM pv_{fb}
        ) c CROSS JOIN tt_{fb} tt
      ) WHERE rn = 1
    ),
    eval_{fb} AS (
      SELECT {fb} AS frac_bucket, b.n_train,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN (CASE WHEN l.q <= b.threshold
                                      THEN b.left_pred ELSE b.right_pred END) = l.y
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      FROM labeled l CROSS JOIN best_{fb} b
      WHERE l.split_b >= 205
      GROUP BY b.n_train
    )"""
        )
    evals = " UNION ALL ".join(f"SELECT * FROM eval_{fb}" for fb in _CURVE_FRACTIONS)
    return f"""
    WITH labeled AS MATERIALIZED (
      SELECT q, y,
             ({_HEXPOS.format(p=1)}) * 16 + ({_HEXPOS.format(p=2)}) AS split_b,
             ({_HEXPOS2.format(p=1)}) * 16 + ({_HEXPOS2.format(p=2)}) AS sub_b
      FROM (
        SELECT l_quantity AS q,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)) AS h,
               md5('sub:' || CAST(l_orderkey * 10 + l_linenumber AS VARCHAR))
                 AS h2
        FROM lineitem
      )
    ),{",".join(per_frac)}
    SELECT CAST(frac_bucket AS BIGINT) AS frac_bucket, n_train, n_test,
           n_correct,
           CAST(n_correct AS DOUBLE) / n_test AS test_accuracy
    FROM ({evals}) ORDER BY frac_bucket
    """


_HEXPOS2 = "strpos('0123456789abcdef', substr(h2, {p}, 1)) - 1"


@register("ml_learning_curve", _curve_oracle())
def ml_learning_curve(spark, sf_dir):
    """Learning curve: the accuracy-optimal stump is trained on
    md5-deterministic ~10% / ~30% / 100% subsets of the ~80% train
    split and each model is scored on the SAME held-out ~20% test
    split — the data-scaling diagnostic (does accuracy still climb
    with more data?) that a 100 TB training pipeline runs before
    paying for more tokens. Split and subset assignment are
    independent md5 bytes of the row id (no RNG, stable across
    engines/cluster sizes — the llm_train_test_split doctrine);
    training argmax is the exact-integer correct-count criterion
    (ml_random_forest_vote); test accuracy is integer counts + one
    division per curve point. Scale: each curve point is one
    per-value grid aggregate + broadcast model eval — all
    partial-aggregable. Reference analog: none (extends
    ml_decision_stump / llm_train_test_split)."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    labeled = li.select(
        "q",
        "y",
        md5_bucket(F.col("rid").cast("string"), n_digits=2).alias("split_b"),
        md5_bucket(
            F.concat(F.lit("sub:"), F.col("rid").cast("string")), n_digits=2
        ).alias("sub_b"),
    ).localCheckpoint()
    test = labeled.where(F.col("split_b") >= 205)
    out = []
    for fb in _CURVE_FRACTIONS:
        train = labeled.where((F.col("split_b") < 205) & (F.col("sub_b") < fb))
        pv = train.groupBy("q").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        tt = pv.agg(
            F.sum("n").alias("nt"),
            F.sum("pos").alias("post"),
            F.sum("n").cast("long").alias("n_train"),
        )
        wc = Window.orderBy("q")
        cum = pv.select(
            "q", F.sum("n").over(wc).alias("nl"), F.sum("pos").over(wc).alias("posl")
        )
        correct = F.greatest(F.col("posl"), F.col("nl") - F.col("posl")) + F.greatest(
            F.col("post") - F.col("posl"),
            (F.col("nt") - F.col("nl")) - (F.col("post") - F.col("posl")),
        )
        best = (
            cum.crossJoin(F.broadcast(tt))
            .select(
                F.col("q").alias("threshold"),
                "n_train",
                correct.alias("correct"),
                F.when(F.col("posl") * 2 >= F.col("nl"), 1).otherwise(0).alias("left_pred"),
                F.when(
                    (F.col("post") - F.col("posl")) * 2 >= (F.col("nt") - F.col("nl")),
                    1,
                )
                .otherwise(0)
                .alias("right_pred"),
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(F.desc("correct"), F.asc("threshold"))
                ),
            )
            .where(F.col("rn") == 1)
            .select("threshold", "left_pred", "right_pred", "n_train")
        )
        ev = (
            test.crossJoin(F.broadcast(best))
            .select(
                "n_train",
                F.when(
                    F.when(F.col("q") <= F.col("threshold"), F.col("left_pred"))
                    .otherwise(F.col("right_pred"))
                    == F.col("y"),
                    1,
                )
                .otherwise(0)
                .alias("ok"),
            )
            .groupBy("n_train")
            .agg(
                F.count("*").cast("long").alias("n_test"),
                F.sum("ok").cast("long").alias("n_correct"),
            )
            .select(
                F.lit(fb).cast("long").alias("frac_bucket"),
                "n_train",
                "n_test",
                "n_correct",
                (F.col("n_correct").cast("double") / F.col("n_test")).alias(
                    "test_accuracy"
                ),
            )
        )
        out.append(ev)
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res.orderBy("frac_bucket")
