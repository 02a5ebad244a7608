"""Eighth extension batch (round 5): corpus-curation operators that a
100 TB training-data pipeline runs between dedup and packing —
deterministic quota sampling, output-shard balance, embedding hygiene,
and Zipf calibration. All exact-oracle, scalar outputs, RNG-free.

The reference has no analog for any of these (its pipeline ends at
feature scaling, project/database_and_model_tools.py:27-230); they
extend the engine's LLM-data surface per the build mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .llm.prep import md5_bucket
from .llm.textstats import words_col
from .registry import _t, register

# hex-digit arithmetic shared with the DuckDB oracles (same contract as
# llm/prep.md5_bucket — keep in lockstep)
_HEX1 = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"
_BUCKET4 = (
    f"((({_HEX1.format(p=1)}) * 16 + ({_HEX1.format(p=2)})) * 16"
    f" + ({_HEX1.format(p=3)})) * 16 + ({_HEX1.format(p=4)})"
)


@register(
    "llm_quota_sample_by_source",
    f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             CAST(round(pow(count(*), 0.7)) AS BIGINT) AS unnorm
      FROM documents GROUP BY source
    ),
    z AS (SELECT sum(unnorm) AS z, sum(n_docs) AS total FROM s),
    rates AS (
      SELECT source, n_docs,
             -- integer threshold in 16^4 buckets: ~30% corpus budget
             -- split by temperature-flattened share n^0.7, capped at
             -- the full source; all-integer math so both engines cut
             -- at the identical bucket
             least(CAST(65536 AS BIGINT),
                   (3 * total * unnorm * 65536) // (10 * z * n_docs))
               AS thresh
      FROM s CROSS JOIN z
    ),
    hashed AS (
      SELECT d.source, d.doc_id,
             {_BUCKET4} AS bucket
      FROM (SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents) d
    )
    SELECT r.source, r.n_docs,
           CAST(r.thresh AS BIGINT) AS thresh,
           CAST(sum(CASE WHEN hd.bucket < r.thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(sum(CASE WHEN hd.bucket < r.thresh THEN hd.doc_id ELSE 0 END)
                AS BIGINT) AS sum_sampled_ids
    FROM hashed hd JOIN rates r USING (source)
    GROUP BY r.source, r.n_docs, r.thresh
    """,
)
def llm_quota_sample_by_source(spark, sf_dir):
    """Deterministic quota sampling by source: a ~30% corpus budget is
    split across sources by the temperature-flattened share n^0.7
    (the llm_source_temperature_mix rule), and each source's quota
    becomes an md5-bucket threshold — membership is a pure function of
    doc_id, so the sample is reproducible across runs, engines, and
    cluster sizes, and composes with the hash train/test split. All
    threshold math is integer (rounded-pow unnorms, 16^4 buckets,
    integer division) so both engines cut at the identical bucket; the
    id-sum digest proves the exact membership set, not just counts.
    Scale shape: one grouped count (source-bounded), a broadcast of
    the per-source thresholds, one narrow filter — the corpus is
    never shuffled."""
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.pow(F.count(F.lit(1)), 0.7)).cast("long").alias("unnorm"),
    )
    z = s.agg(F.sum("unnorm").alias("z"), F.sum("n_docs").alias("total"))
    rates = s.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(65536).cast("long"),
            F.expr("(3 * total * unnorm * 65536) DIV (10 * z * n_docs)"),
        ).alias("thresh"),
    )
    hashed = d.select("source", "doc_id", md5_bucket(F.col("doc_id"), 4).alias("bucket"))
    hit = F.col("bucket") < F.col("thresh")
    return (
        hashed.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "thresh")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_sampled"),
            F.sum(F.when(hit, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("sum_sampled_ids"),
        )
    )


@register(
    "ext_shard_balance_report",
    f"""
    SELECT (({_HEX1.format(p=1)}) * 16 + ({_HEX1.format(p=2)})) % 32 AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(count(*) * 32.0 / sum(count(*)) OVER (), 4) AS balance_factor
    FROM (SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
    GROUP BY 1
    """,
)
def ext_shard_balance_report(spark, sf_dir):
    """Output-shard balance report: assign every document to one of 32
    shards by consistent md5 hash and report per-shard row/byte totals
    plus the balance factor (shard size over ideal size — the straggler
    predictor for a 100 TB write). Hash sharding is how the engine
    would lay out its output files; this entry is the audit that the
    layout is actually even. One grouped count; the 32-row window for
    the factor is shard-bounded."""
    d = _t(spark, sf_dir, "documents")
    shard = (md5_bucket(F.col("doc_id"), 2) % 32).alias("shard_id")
    per = d.select(shard, "n_chars").groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    total = per.agg(F.sum("n_docs").alias("total"))
    return per.crossJoin(F.broadcast(total)).select(
        "shard_id",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs") * 32.0 / F.col("total"), 4).alias("balance_factor"),
    )


@register(
    "llm_embedding_norm_stats",
    """
    WITH norms AS (
      SELECT label,
             round(sqrt(list_sum(list_transform(embedding,
                                                x -> CAST(x AS DOUBLE)
                                                     * CAST(x AS DOUBLE)))), 6)
               AS nrm
      FROM embeddings
    )
    SELECT label, count(*) AS n_vecs,
           round(min(nrm), 4) AS min_norm,
           round(quantile_cont(nrm, 0.5), 4) AS p50_norm,
           round(quantile_cont(nrm, 0.95), 4) AS p95_norm,
           round(max(nrm), 4) AS max_norm,
           CAST(sum(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero
    FROM norms GROUP BY label
    """,
)
def llm_embedding_norm_stats(spark, sf_dir):
    """Embedding hygiene stats per label: L2-norm percentiles and
    zero-vector counts — the pre-flight every ANN/similarity stage
    needs (zero vectors break cosine; a wide norm spread says the
    embeddings aren't normalized and dot-product ranking will be
    magnitude-biased). The norm is a per-row left-fold in array order
    (identical fold order in both engines, rounded to 6dp before the
    percentile so interpolation sees identical inputs); the rollup is
    label-bounded."""
    e = _t(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    nrm = F.round(
        F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 6
    ).alias("nrm")
    norms = e.select("label", nrm)
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.percentile("nrm", F.lit(0.5)), 4).alias("p50_norm"),
        F.round(F.percentile("nrm", F.lit(0.95)), 4).alias("p95_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.sum((F.col("nrm") < 1e-6).cast("int")).cast("long").alias("n_zero"),
    )


@register(
    "llm_zipf_topk_terms",
    """
    WITH tc AS (
      SELECT w, count(*) AS n FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM tc)
    SELECT CAST(rnk AS BIGINT) AS rnk, w AS term, n,
           round(n / total, 6) AS share,
           round(rnk * n / total, 6) AS zipf_const
    FROM (
      SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rnk
      FROM tc
    ) CROSS JOIN tot
    WHERE rnk <= 20
    """,
)
def llm_zipf_topk_terms(spark, sf_dir):
    """Zipf calibration: the 20 most frequent corpus terms with their
    share and rank x share product (constant under Zipf's law — the
    sanity check that a corpus looks like natural language rather than
    boilerplate or generator output). One explode into a vocabulary-
    bounded count; the global top-20 is orderBy+limit — compiled to a
    distributed TakeOrderedAndProject (per-partition partial top-k),
    NOT a rank window, which would funnel the whole vocabulary through
    one partition; row_number then ranks only the 20 survivors; share
    denominators ride a 1-row broadcast."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tc.agg(F.sum("n").cast("double").alias("total"))
    ranked = (
        tc.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(20)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("w").asc())),
        )
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        F.col("rnk").cast("long").alias("rnk"),
        F.col("w").alias("term"),
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("share"),
        F.round(F.col("rnk") * F.col("n") / F.col("total"), 6).alias("zipf_const"),
    )
