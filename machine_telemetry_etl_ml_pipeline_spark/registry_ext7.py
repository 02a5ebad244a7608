"""Round-4 extension batch.

Streaming operational guarantees: stream_topk_update_mode (pruned-CDC
top-k, lossless for monotone counts — proof in docstring),
stream_checkpoint_resume (exactly-once restart from a shared
checkpoint), stream_stream_join_outer (LEFT OUTER interval join with
the exact watermark-eviction rule encoded in the oracle),
ext_session_dynamic_gap (per-event-gap session windows via running-max
interval union).

Corpus curation / tokenizer analytics: llm_segment_dedup (C4-style
first-occurrence segment dedup), llm_bpe_merge_step (adjacent-pair
merge counting), llm_bigram_logprob (add-one-smoothed bigram LM),
llm_vocab_coverage (top-k token coverage curve),
llm_minhash_band_tuning (LSH S-curve probe), llm_ngram_containment
(asymmetric near-dup measure), llm_char_entropy (gibberish detector),
llm_winnowing_fingerprints (MOSS window-min fingerprinting),
llm_source_temperature_mix (share^tau sampling weights),
llm_ann_filtered_topk / llm_knn_label_accuracy (metadata-filtered and
label-vote vector search), llm_tfidf_topk_terms (keyword extraction).

ML and stats: ml_fpgrowth_itemsets (exact SQL-combinatorics oracle),
ml_als_recommend (invariant-checked factorization),
ml_chi_square_assoc (contingency moments), ml_naive_bayes_sql (the
whole NB train/score/evaluate loop in closed-form relational algebra).

Engine/SQL surfaces: ext_source_xml, ext_metadata_columns,
ext_observation_metrics, ext_hll_sketch_merge (re-aggregable NDV),
ext_snapshot_time_travel, ext_null_semantics, ext_lateral_view_sql,
ext_sql_tvf, ext_parameterized_sql, ext_bitwise_agg,
ext_grouped_median, ext_decimal_exact, ext_asof_join_forward.

Reference anchor: the reference's text/ETL surface stops at
per-document feature extraction (/root/reference/project/
database_and_model_tools.py); these extend the same tables the way a
production analytics + training-data platform does. Float-parity
convention (round-1 memory): ratios rounded to 4dp on both sides;
counts and money stay integer/decimal-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .llm.textstats import words_col
from .registry import _t, register

# --- streaming update-mode top-k (pruned CDC) ---------------------------------


@register(
    "stream_topk_update_mode",
    """
    SELECT user_id, n
    FROM (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    ORDER BY n DESC, user_id
    LIMIT 10
    """,
)
def stream_topk_update_mode(spark, sf_dir):
    """Streaming top-k in UPDATE output mode with per-batch candidate
    pruning: the events stream is consumed one file per micro-batch,
    the per-user count aggregate emits only changed keys (update
    mode), and foreachBatch writes only the batch's OWN top-10 of
    those changed keys to the CDC sink — O(k) rows per batch, not
    O(changed keys). The final read compacts last-write-wins per key
    and takes the global top-10.

    Why pruning is lossless here: counts are monotone non-decreasing.
    If a key belongs to the final global top-10, then in the last
    batch that changed it, any key that out-ranked it (higher count,
    or equal count with a smaller user_id tiebreak — the same ordering
    used everywhere) holds that advantage forever; fewer than 10 such
    keys can exist, so the key makes its batch's top-10 carrying its
    FINAL count. Stale rows from earlier batches carry smaller counts
    and cannot displace true members. The oracle is the plain batch
    top-10 — exact equality, not approximation."""
    import tempfile
    import uuid

    from pyspark.sql.window import Window

    from .session import tune_session

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="stream_topk_")
    src, sink, ckpt = f"{work}/src", f"{work}/sink", f"{work}/ckpt"
    e = _t(spark, sf_dir, "events")
    e.select("event_id", "user_id").repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))

    def _prune_upsert(batch, batch_id: int) -> None:
        top = batch.orderBy(F.desc("n"), F.asc("user_id")).limit(10)
        top.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink)

    q = (
        agg.writeStream.foreachBatch(_prune_upsert)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .queryName(f"topk_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination()

    cdc = spark.read.parquet(sink)
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    latest = (
        cdc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n")
    )
    return latest.orderBy(F.desc("n"), F.asc("user_id")).limit(10)


# --- C4-style corpus-wide segment dedup ----------------------------------------


@register(
    "llm_segment_dedup",
    """
    WITH ws AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    segs AS (
      SELECT doc_id, CAST((i - 1) // 10 AS INT) AS seg_idx,
             array_to_string(list_slice(ws, i, least(i + 9, len(ws))), ' ') AS seg
      FROM (
        SELECT doc_id, ws, unnest(generate_series(1, len(ws), 10)) AS i
        FROM ws WHERE len(ws) > 0
      )
    ),
    marked AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    )
    SELECT doc_id,
           count(*) AS n_segs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS kept_ratio
    FROM marked
    GROUP BY doc_id
    """,
)
def llm_segment_dedup(spark, sf_dir):
    """C4-style duplicated-line removal at corpus scope, on a corpus
    with no newlines: each document is cut into non-overlapping
    10-word segments (trailing partial kept, like a short last line),
    a segment survives only at its FIRST occurrence — min (doc_id,
    seg_idx) across the whole corpus — and every document reports its
    retention. Shapes for 100 TB: segments are built with array
    slice/zip expressions (one Generate, no self-join); first-
    occurrence is a PARTIAL-AGGREGABLE groupBy(seg).min(struct) — the
    r13 shape: duplicate segments collapse map-side and the one
    seg-keyed exchange carries a single (seg, min-owner) row per
    distinct segment per task, with NO sort (the r4-r12 window shape
    shuffled EVERY segment row's full text into a per-seg sort; guide
    §2.3 "aggregate before you shuffle"). Per-doc retention then
    needs only the winners: count firsts by owning doc (a doc-keyed
    exchange of <= |distinct segs| skinny rows) and join that onto
    per-doc segment counts computed arithmetically from the word
    count — ceil(|words|/10) = the exploded row count by construction
    — so the fact side never re-explodes. Nothing is ever quadratic
    in corpus size."""
    d = _t(spark, sf_dir, "documents")
    ws = words_col(F.col("text"))
    starts = F.sequence(F.lit(1), F.size(ws), F.lit(10))
    segs = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("seg_idx"),
            F.array_join(F.slice(ws, s, 10), " ").alias("seg"),
        ),
    )
    seg_rows = (
        d.filter(F.size(ws) > 0)
        .select("doc_id", F.explode(segs).alias("s"))
        .select("doc_id", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
    )
    # The oracle's winner is min(doc_id, seg_idx) lexicographic — but
    # its OWNING DOC is determined by min(doc_id) alone (seg_idx only
    # breaks ties within one doc, and per distinct segment exactly one
    # winner row exists either way), so the aggregate buffer is a
    # plain LONG: HashAggregate fires (min over a struct falls back to
    # SortAggregate — measured r13: two extra Sorts of every exploded
    # segment row). Partial min collapses duplicates map-side.
    kept = (
        seg_rows.groupBy("seg")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    # sequence(1, n, 10) has exactly floor((n-1)/10)+1 elements for
    # n >= 1, so n_segs is arithmetic on the word count — no second
    # explode; doc_id is unique in documents, so no aggregation either.
    docstats = d.filter(F.size(ws) > 0).select(
        "doc_id",
        (F.floor((F.size(ws) - F.lit(1)) / F.lit(10)) + F.lit(1))
        .cast("long")
        .alias("n_segs"),
    )
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
    return docstats.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        n_kept.alias("n_kept"),
        F.round(n_kept.cast("double") / F.col("n_segs"), 4).alias("kept_ratio"),
    )


# --- dynamic-gap session windows ----------------------------------------------


@register(
    "ext_session_dynamic_gap",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             CASE WHEN event_type = 'click' THEN 1800000000
                  ELSE 3600000000 END AS gap
      FROM events
    ),
    o AS (
      SELECT user_id, event_id, t, gap,
             max(t + gap) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_end
      FROM e
    ),
    m AS (
      SELECT user_id, event_id, t, gap,
             CASE WHEN prev_end IS NULL OR t >= prev_end THEN 1 ELSE 0 END
               AS is_start
      FROM o
    ),
    s AS (
      SELECT user_id, t, gap,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           CAST(min(t) // 1000000 AS BIGINT) AS sess_start,
           CAST(max(t + gap) // 1000000 AS BIGINT) AS sess_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def ext_session_dynamic_gap(spark, sf_dir):
    """Native session_window with a DYNAMIC per-event gap (30 min for
    clicks, 60 min otherwise) — the idle-timeout-depends-on-activity
    sessionization streaming engines advertise. This is NOT the
    lag-based gaps-and-islands of ext_session_windows: with variable
    gaps, sessions merge on the RUNNING MAX of window ends (interval
    union), which the oracle reproduces with an unbounded-preceding
    max in exact epoch-microseconds. One user_id-keyed exchange +
    sort on either engine; session starts/ends projected as floored
    epoch seconds (unix_timestamp semantics)."""
    e = _t(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "click", F.lit("30 minutes")).otherwise(
        F.lit("60 minutes")
    )
    return (
        e.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("sess_start"),
            F.unix_timestamp(F.col("w.end")).cast("long").alias("sess_end"),
            "n_events",
        )
    )


# --- bigram LM scoring (add-one smoothing) -------------------------------------


@register(
    "llm_bigram_logprob",
    """
    WITH ws AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM ws WHERE len(ws) > 1)
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1),
    v AS (
      SELECT count(DISTINCT w) AS vocab
      FROM (SELECT w1 AS w FROM bigrams UNION ALL SELECT w2 FROM bigrams)
    )
    SELECT doc_id,
           round(avg(ln(CAST(c12 + 1 AS DOUBLE) / (c1 + vocab))), 4)
             AS mean_logprob,
           count(*) AS n_bigrams
    FROM bigrams
    JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def llm_bigram_logprob(spark, sf_dir):
    """Per-document bigram language-model score with add-one
    smoothing: mean ln((c(w1,w2)+1) / (c(w1)+|V|)) — the perplexity
    proxy quality filters use one step beyond llm_unigram_logprob's
    unigram LM. Shapes for 100 TB: bigrams come from zip_with over
    shifted slices (one Generate, no self-join); c12/c1 are
    partial-aggregable counts joined back on their own keys (pair- and
    word-keyed shuffles, never row x vocab); |V| is a 1-row broadcast
    cross join."""
    d = _t(spark, sf_dir, "documents")
    ws = words_col(F.col("text"))
    n = F.size(ws)
    pair_arr = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bigrams = (
        d.filter(n > 1)
        .select("doc_id", F.explode(pair_arr).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        bigrams.select(F.col("w1").alias("w"))
        .unionAll(bigrams.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").alias("vocab"))
    )
    scored = (
        bigrams.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("vocab"))).alias(
                "lp"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("lp"), 4).alias("mean_logprob"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


# --- k-NN label prediction accuracy --------------------------------------------


@register(
    "llm_knn_label_accuracy",
    """
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, label AS true_label, v AS qv
      FROM e WHERE vec_id < 50
    ),
    scored AS (
      SELECT query_id, true_label, e.label AS nlabel,
             round(list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(v, v))), 4) AS sim,
             e.vec_id AS neighbor_id
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    top5 AS (
      SELECT query_id, true_label, nlabel
      FROM (
        SELECT query_id, true_label, nlabel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored
      ) WHERE rnk <= 5
    ),
    votes AS (
      SELECT query_id, true_label, nlabel, count(*) AS n_votes
      FROM top5 GROUP BY query_id, true_label, nlabel
    ),
    pred AS (
      SELECT query_id, true_label, nlabel AS pred_label
      FROM (
        SELECT query_id, true_label, nlabel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, nlabel) AS r
        FROM votes
      ) WHERE r = 1
    )
    SELECT count(*) AS n_queries,
           CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred
    """,
)
def llm_knn_label_accuracy(spark, sf_dir):
    """k-NN classification accuracy (k=5, majority vote) over the
    embedding table — the eval loop that scores an embedding space
    before committing it to retrieval. Fully deterministic: cosine
    rounded to 4dp with neighbor-id tiebreaks picks the SAME top-5 in
    both engines, and vote ties break on the smaller label. Scale
    shape: the 50-query panel is broadcast against the corpus (one
    scan), votes/argmax are query-keyed aggregates; accuracy of a
    full-corpus eval would swap the broadcast side for the LSH/IVF
    candidate path like the ANN entries."""
    from pyspark.sql.window import Window

    from .llm.similarity import _as_double, cosine

    e = _t(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "label", _as_double(F.col("embedding")).alias("v"))
    q = base.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    scored = base.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "true_label",
        F.col("label").alias("nlabel"),
        F.round(cosine(F.col("qv"), F.col("v")), 4).alias("sim"),
        F.col("vec_id").alias("neighbor_id"),
    )
    w_sim = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    top5 = scored.withColumn("rnk", F.row_number().over(w_sim)).filter(
        F.col("rnk") <= 5
    )
    votes = top5.groupBy("query_id", "true_label", "nlabel").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("nlabel").asc()
    )
    pred = (
        votes.withColumn("r", F.row_number().over(w_vote))
        .filter(F.col("r") == 1)
        .select("query_id", "true_label", F.col("nlabel").alias("pred_label"))
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        ).cast("long").alias("n_correct"),
    )


# --- SQL table-valued functions ------------------------------------------------


@register(
    "ext_sql_tvf",
    """
    SELECT i AS n, n2, CAST(i % 7 AS BIGINT) AS bucket
    FROM (
      SELECT unnest(generate_series(0, 999)) AS i,
             unnest(generate_series(0, 999)) * 2 AS n2
    )
    """,
)
def ext_sql_tvf(spark, sf_dir):
    """Table-valued functions in the FROM clause (range() as a SQL
    relation) — the inline data-generation surface used for calendar
    spines, test scaffolds, and cross products with real tables. The
    range TVF parallelizes as a partitioned synthetic scan (no driver
    materialization), unlike createDataFrame."""
    return spark.sql(
        """
        SELECT id AS n, id * 2 AS n2, id % 7 AS bucket
        FROM range(0, 1000)
        """
    )


# --- parameterized SQL ---------------------------------------------------------


@register(
    "ext_parameterized_sql",
    """
    SELECT event_type, count(*) AS n,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS total
    FROM events
    WHERE value > 150 AND event_type <> 'error'
    GROUP BY event_type
    """,
)
def ext_parameterized_sql(spark, sf_dir):
    """Named-parameter SQL binding (spark.sql(..., args=...), Spark
    3.4+): the injection-safe templating surface applications should
    use instead of f-strings. Parameters bind as literals in the
    analyzed plan, so constant folding and pushdown see them exactly
    like inline constants."""
    from .registry_ext2 import _views

    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type, count(*) AS n,
               round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0D, 4) AS total
        FROM events
        WHERE value > :min_value AND event_type <> :excluded
        GROUP BY event_type
        """,
        args={"min_value": 150, "excluded": "error"},
    )


# --- winnowing fingerprints (MOSS-style) ---------------------------------------


@register(
    "llm_winnowing_fingerprints",
    """
    WITH grams AS (
      SELECT doc_id, i, md5(substr(text, i, 8)) AS h
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM documents
      )
    ),
    winmin AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id) AS n_grams,
             i
      FROM grams
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp
      FROM winmin WHERE i <= n_grams - 3
    )
    SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp
    FROM fps GROUP BY doc_id
    """,
)
def llm_winnowing_fingerprints(spark, sf_dir):
    """Winnowing document fingerprinting (the MOSS algorithm): hash
    every 8-char gram, slide a window of 4 consecutive gram hashes,
    keep each window's MINIMUM — guaranteeing any shared substring of
    length >= 11 yields at least one shared fingerprint while storing
    only ~2/(w+1) of the hashes. The fingerprint SET per document is
    order-insensitive, so the entry reports its size and minimum
    (hashable scalars).

    Plan shape: the window-min never leaves the row — gram hashes are
    an array column, the width-4 sliding min is a least-zip of the
    array with its 1/2/3-shifted tails, and the per-doc report is
    size/array_min of the distinct set. Zero shuffles, zero explode:
    at 100 TB this is a pure narrow map over documents, versus the
    exploded-gram plan that shuffled the full gram table three times
    (window + distinct + rollup).

    Expression-engine trap this encodes: a per-position lambda like
    transform(sequence(1, n-3), j -> array_min(slice(hs, j, 4)))
    is O(n^2) — CollapseProject inlines the md5-transform that
    defines hs into the lambda body, and interpreted HOF eval then
    rebuilds the whole hash array per window position (measured 90s
    on 50 docs). zip_with evaluates its array arguments once per ROW,
    and referencing hs four times in one projection blocks the
    inlining, so the md5 pass runs exactly once."""
    d = _t(spark, sf_dir, "documents")
    # the narrow plan's parallelism equals the scan's split count; a
    # small input (fewer splits than cores) gets one round-robin
    # repartition of the RAW text — far cheaper than the exploded gram
    # table the window formulation shuffled three times — while a
    # 100 TB input already has >> cores splits and skips the branch
    cores = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < cores:
        d = d.repartition(cores)
    n_grams = F.greatest(F.length("text") - 7, F.lit(1))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(F.col("text").substr(i, F.lit(8))),
    )
    hashed = d.select("doc_id", n_grams.alias("n_grams"), gram_hashes.alias("hs"))

    def shifted(k):
        return F.slice(
            F.col("hs"), k + 1, F.greatest(F.col("n_grams") - k, F.lit(1))
        )

    least = lambda a, b: F.least(a, b)  # noqa: E731 — null-safe min
    m01 = F.zip_with(F.col("hs"), shifted(1), least)
    m23 = F.zip_with(shifted(2), shifted(3), least)
    minarr = F.zip_with(m01, m23, least)
    # windows start at gram j = 1..n_grams-3; docs too short for one
    # full window emit no fingerprints (absent from output, like the
    # oracle's i <= n_grams - 3 filter)
    win = hashed.filter(F.col("n_grams") >= 4).select(
        "doc_id", "n_grams", minarr.alias("minarr")
    )
    fps = F.array_distinct(F.slice(F.col("minarr"), 1, F.col("n_grams") - 3))
    return win.select("doc_id", fps.alias("fps")).select(
        "doc_id",
        F.size("fps").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
    )


# --- per-source document-length bands ------------------------------------------


@register(
    "llm_length_bands_by_source",
    """
    WITH lens AS (
      SELECT source,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS DOUBLE) AS n_tokens
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           round(quantile_cont(n_tokens, 0.1), 4) AS p10_tokens,
           round(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
           round(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens
    FROM lens GROUP BY source
    """,
)
def llm_length_bands_by_source(spark, sf_dir):
    """Document-length percentile bands per source (P10/P50/P90 token
    counts) — the curation readout that exposes truncated or padded
    slices before they skew packing and loss weighting. Length is an
    array-size expression (no explode); exact grouped percentiles over
    the source-bounded groups."""
    d = _t(spark, sf_dir, "documents")
    n = F.size(words_col(F.col("text"))).cast("double")
    lens = d.select("source", n.alias("n_tokens"))
    return lens.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_tokens", F.lit(0.1)), 4).alias("p10_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 4).alias("p90_tokens"),
    )


# --- grouped z-score normalization ---------------------------------------------


@register(
    "ext_grouped_zscore",
    """
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
    FROM events WHERE user_id < 30
    """,
)
def ext_grouped_zscore(spark, sf_dir):
    """Per-group z-score standardization (the grouped sibling of
    ref_zscore_standardize's global scaler): each value is centered
    and scaled by ITS OWN segment's moments via window aggregates —
    feature engineering that respects per-segment distributions, one
    type-keyed exchange, no second pass."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("event_type")
    return e.select(
        "event_id",
        "event_type",
        F.round(
            (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w),
            4,
        ).alias("z"),
    )


# --- one-row corpus dashboard --------------------------------------------------


@register(
    "llm_corpus_dashboard",
    """
    WITH ws AS (
      SELECT doc_id, text, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    tok AS (SELECT sum(len(words)) AS n_tokens FROM ws),
    voc AS (
      SELECT count(DISTINCT w) AS vocab FROM (
        SELECT unnest(words) AS w FROM ws
      )
    ),
    dup AS (
      SELECT count(*) - count(DISTINCT md5(text)) AS n_exact_dups
      FROM documents
    )
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT count(DISTINCT source) FROM documents) AS n_sources,
           CAST(tok.n_tokens AS BIGINT) AS n_tokens,
           voc.vocab AS vocab_size,
           CAST(dup.n_exact_dups AS BIGINT) AS n_exact_dups,
           round(CAST(tok.n_tokens AS DOUBLE)
                 / (SELECT count(*) FROM documents), 4) AS mean_doc_tokens
    FROM tok, voc, dup
    """,
)
def llm_corpus_dashboard(spark, sf_dir):
    """The one-row corpus dashboard a curation run prints first:
    document/source counts, total tokens, vocabulary size, exact-dup
    count, and mean document length — five partial-aggregable scans
    composed as broadcast-joined singletons (each number is exactly
    the one its dedicated operator computes; this is the headline
    view)."""
    d = _t(spark, sf_dir, "documents")
    ws = words_col(F.col("text"))
    base = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.size(ws)).alias("n_tokens"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
    )
    vocab = d.select(F.explode(ws).alias("w")).agg(
        F.countDistinct("w").alias("vocab_size")
    )
    return (
        base.crossJoin(F.broadcast(vocab))
        .select(
            "n_docs",
            "n_sources",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "vocab_size",
            F.col("n_exact_dups").cast("long").alias("n_exact_dups"),
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 4
            ).alias("mean_doc_tokens"),
        )
    )


# --- out-of-vocabulary rate by source ------------------------------------------


@register(
    "llm_oov_rate_by_source",
    """
    WITH words AS (
      SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rnk
        FROM words GROUP BY w
      ) WHERE rnk <= 20
    )
    SELECT source,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS oov_rate
    FROM words LEFT JOIN vocab v USING (w)
    GROUP BY source
    """,
)
def llm_oov_rate_by_source(spark, sf_dir):
    """Out-of-vocabulary rate per source against a top-20 corpus
    vocabulary — the per-slice tokenizer coverage readout that decides
    which sources need vocab expansion (the drill-down behind
    llm_vocab_coverage's global curve). The vocabulary is rank-bounded
    and BROADCAST into a left join; token counting stays one pass."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    words = d.select("source", F.explode(words_col(F.col("text"))).alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w")))
        )
        .filter(F.col("rnk") <= 20)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            ).alias("oov_rate"),
        )
    )


# --- one-pass data-quality rule report -----------------------------------------


@register(
    "ext_dq_rule_report",
    """
    SELECT 'value_negative' AS rule,
           CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT) AS n_violations
    FROM events
    UNION ALL
    SELECT 'value_above_1000',
           CAST(count(CASE WHEN value > 1000 THEN 1 END) AS BIGINT) FROM events
    UNION ALL
    SELECT 'event_type_unknown',
           CAST(count(CASE WHEN event_type NOT IN
                ('click','view','purchase','signup','error') THEN 1 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'duplicate_event_id',
           CAST((SELECT count(*) - count(DISTINCT event_id) FROM events) AS BIGINT)
    UNION ALL
    SELECT 'ts_out_of_2024',
           CAST(count(CASE WHEN ts < TIMESTAMP '2024-01-01'
                            OR ts >= TIMESTAMP '2025-01-01' THEN 1 END) AS BIGINT)
    FROM events
    """,
)
def ext_dq_rule_report(spark, sf_dir):
    """Data-quality rule report: five contract rules (range bounds,
    domain membership, key uniqueness, timestamp window) evaluated as
    conditional aggregates and emitted as a (rule, violations) table
    — the expectations-suite shape (Great-Expectations-style) run as
    ONE scan plus a distinct-count, not one job per rule."""
    e = _t(spark, sf_dir, "events")
    agg = e.agg(
        F.count(F.when(F.col("value") < 0, 1)).alias("value_negative"),
        F.count(F.when(F.col("value") > 1000, 1)).alias("value_above_1000"),
        F.count(
            F.when(
                ~F.col("event_type").isin(
                    "click", "view", "purchase", "signup", "error"
                ),
                1,
            )
        ).alias("event_type_unknown"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
            "duplicate_event_id"
        ),
        F.count(
            F.when(
                (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2025-01-01").cast("timestamp")),
                1,
            )
        ).alias("ts_out_of_2024"),
    )
    rules = [
        "value_negative",
        "value_above_1000",
        "event_type_unknown",
        "duplicate_event_id",
        "ts_out_of_2024",
    ]
    stacked = ", ".join(f"'{r}', {r}" for r in rules)
    return agg.selectExpr(
        f"stack({len(rules)}, {stacked}) AS (rule, n_violations)"
    ).select("rule", F.col("n_violations").cast("long").alias("n_violations"))


@register(
    "llm_jaccard_histogram",
    """
    WITH w3 AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(ws, i, i + 2), ' ') AS shingle
      FROM (
        SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
        FROM (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents WHERE doc_id < 40
        )
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM w3 GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_inter
      FROM w3 a JOIN w3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT least(CAST(floor(n_inter / (sa.sz + sb.sz - n_inter) * 10)
                        AS BIGINT), 9) AS bucket
      FROM inter
      JOIN sizes sa ON sa.doc_id = a
      JOIN sizes sb ON sb.doc_id = b
    )
    SELECT bucket, round(bucket / 10.0, 1) AS bucket_lo, count(*) AS n_pairs
    FROM jac GROUP BY bucket
    """,
)
def llm_jaccard_histogram(spark, sf_dir):
    """Similarity-threshold calibration: the histogram of exact
    word-3-gram Jaccard over candidate pairs, in 0.1-wide buckets —
    the distribution a dedup pipeline inspects to place its keep/drop
    threshold before committing a full-corpus run (is the mass bimodal
    near 0 and 1, or smeared?). Same shingle-intersection machinery as
    llm_ngram_jaccard; buckets computed on exact integer-derived
    floors (top bucket closed at 9 so jaccard=1.0 doesn't overflow
    the domain)."""
    from .llm.dedup import word_ngrams

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sh = word_ngrams(d)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            F.least(
                F.floor(
                    F.col("n_inter")
                    / (F.col("sza") + F.col("szb") - F.col("n_inter"))
                    * 10
                ).cast("long"),
                F.lit(9),
            ).alias("bucket")
        )
    )
    return jac.groupBy("bucket").agg(
        F.round(F.col("bucket") / 10.0, 1).alias("bucket_lo"),
        F.count(F.lit(1)).alias("n_pairs"),
    ).select("bucket", "bucket_lo", "n_pairs")


# --- top-N plus Other rollup ---------------------------------------------------


@register(
    "ext_topn_other",
    """
    WITH counts AS (
      SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    ),
    ranked AS (
      SELECT event_type, n,
             row_number() OVER (ORDER BY n DESC, event_type) AS rnk
      FROM counts
    )
    SELECT CASE WHEN rnk <= 3 THEN event_type ELSE 'Other' END AS category,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(min(rnk) AS BIGINT) AS display_order
    FROM ranked
    GROUP BY CASE WHEN rnk <= 3 THEN event_type ELSE 'Other' END
    """,
)
def ext_topn_other(spark, sf_dir):
    """Top-N + 'Other' rollup — the pie-chart/legend query every BI
    layer generates: the 3 largest categories keep their names, the
    tail collapses into one bucket, with a deterministic display
    order. Rank runs over the tiny category domain; the heavy count is
    partial-aggregable."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ranked = counts.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("event_type"))),
    )
    cat = F.when(F.col("rnk") <= 3, F.col("event_type")).otherwise(F.lit("Other"))
    return (
        ranked.groupBy(cat.alias("category"))
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.min("rnk").cast("long").alias("display_order"),
        )
    )


# --- time-weighted average (LOCF integral) -------------------------------------


@register(
    "ext_time_weighted_avg",
    """
    WITH o AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             lag(epoch_us(ts)) OVER w AS prev_t,
             lag(value) OVER w AS prev_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           round(sum((t - prev_t) * prev_v) / sum(t - prev_t), 4) AS twa,
           count(*) + 1 AS n_points
    FROM o WHERE prev_t IS NOT NULL
    GROUP BY user_id
    """,
)
def ext_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per user (last-observation-carried-forward
    integral / elapsed time) — the telemetry mean that is CORRECT for
    irregular sampling, where the naive row average over-weights burst
    periods (TimescaleDB's time_weight). Exact epoch-microsecond lag
    arithmetic; one user-keyed sort window, then a partial-aggregable
    weighted sum."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    o = e.select(
        "user_id",
        "value",
        t.alias("t"),
        F.lag(t).over(w).alias("prev_t"),
        F.lag("value").over(w).alias("prev_v"),
    ).filter(F.col("prev_t").isNotNull())
    return o.groupBy("user_id").agg(
        F.round(
            F.sum((F.col("t") - F.col("prev_t")) * F.col("prev_v"))
            / F.sum(F.col("t") - F.col("prev_t")),
            4,
        ).alias("twa"),
        (F.count(F.lit(1)) + 1).alias("n_points"),
    )


# --- funnel conversion WITHIN sessions -----------------------------------------


@register(
    "ext_sessionized_funnel",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    ),
    stages AS (
      SELECT user_id, sid,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS t_purchase
      FROM sess GROUP BY user_id, sid
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full_funnel
    FROM stages
    """,
)
def ext_sessionized_funnel(spark, sf_dir):
    """Funnel conversion WITHIN 30-minute sessions: view -> click ->
    purchase must occur in order INSIDE one session, not merely ever
    (the product-analytics question ext_funnel_conversion's
    whole-history form can't answer). Sessionization (gaps-and-
    islands) and the ordered-stage check (min event time per stage,
    strict ordering) run in one user-keyed sort window + one grouped
    conditional aggregate."""
    from pyspark.sql.window import Window

    from .operators.windows import sessionized

    e = _t(spark, sf_dir, "events")
    s = sessionized(e, "user_id", "ts", 1800, tiebreak="event_id", precision="micros")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    stages = s.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", t)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", t)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", t)).alias("t_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_view"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_view_click"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_full_funnel"),
    )


# --- Benford first-digit screening ---------------------------------------------


@register(
    "ext_benford_screen",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM events WHERE value >= 0.01
    ),
    counts AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM counts)
    SELECT d AS first_digit, n,
           round(n / total, 4) AS observed_share,
           round(log10(1.0 + 1.0 / d), 4) AS benford_share
    FROM counts CROSS JOIN tot
    """,
)
def ext_benford_screen(spark, sf_dir):
    """Benford first-digit screening: observed vs theoretical
    log10(1 + 1/d) first-digit shares of the value column — the audit
    pass fraud/data-quality teams run over money-like columns.
    First digit extracted from exact integer cents (no float
    formatting ambiguity); digit domain is 1-9, so everything after
    the scan is constant-size."""
    e = _t(spark, sf_dir, "events").filter(F.col("value") >= 0.01)
    d = F.substring(
        F.round(F.col("value") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    counts = e.select(d.alias("d")).groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        "n",
        F.round(F.col("n") / F.col("total"), 4).alias("observed_share"),
        F.round(F.log10(1.0 + 1.0 / F.col("d")), 4).alias("benford_share"),
    )


# --- grouping() NULL disambiguation --------------------------------------------


@register(
    "ext_grouping_id",
    """
    SELECT coalesce(event_type, '(all)') AS event_type,
           CAST(grouping(event_type) AS BIGINT) AS is_total,
           count(*) AS n
    FROM events GROUP BY ROLLUP(event_type)
    """,
)
def ext_grouping_id(spark, sf_dir):
    """grouping() disambiguation in ROLLUP output: the aggregate
    NULL-vs-data NULL problem — a rollup total row and a genuine NULL
    key both print NULL, and only grouping()/grouping_id() can tell
    them apart (the correctness trap under every subtotal report).
    The flag is carried alongside a coalesced label, exactly as a
    report query would emit it."""
    e = _t(spark, sf_dir, "events")
    return (
        e.rollup("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping("event_type").alias("g"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.col("g").cast("long").alias("is_total"),
            "n",
        )
    )


# --- first-touch attribution ---------------------------------------------------


@register(
    "ext_attribution_first_touch",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    touches AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             first(v.event_id ORDER BY v.ts, v.event_id) AS first_view_id
      FROM p JOIN v
        ON v.user_id = p.user_id
       AND v.ts >= p.ts - INTERVAL 24 HOUR AND v.ts < p.ts
      GROUP BY p.event_id, p.user_id
    )
    SELECT purchase_id, user_id, first_view_id FROM touches
    """,
)
def ext_attribution_first_touch(spark, sf_dir):
    """First-touch attribution: for each purchase, the EARLIEST view
    in the 24 hours before it — the credit-assignment query marketing
    warehouses run nightly (last-touch is ext_asof_join; this is its
    windowed-min sibling, and unlike as-of it needs the bounded range
    join + min, not a carried value). The join is user-keyed with a
    time-range predicate bounding state; min_by gives the earliest
    view deterministically (event_id tiebreak via struct ordering)."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("v_ts") < F.col("p_ts")),
    )
    return (
        joined.groupBy("purchase_id", "user_id")
        .agg(F.min(F.struct("v_ts", "view_id")).alias("first"))
        .select("purchase_id", "user_id", F.col("first.view_id").alias("first_view_id"))
    )


# --- dedup cluster-size report -------------------------------------------------

_CLUSTER_SIZES_ORACLE = """
    WITH sh AS (
      SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
        FROM documents
      )
    ),
    mh AS (
      SELECT doc_id,
             min(substr(md5(shingle), 1, 8))  AS mh1, min(substr(md5(shingle), 9, 8))  AS mh2,
             min(substr(md5(shingle), 17, 8)) AS mh3, min(substr(md5(shingle), 25, 8)) AS mh4
      FROM sh GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, md5(mh1 || '|' || mh2) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, md5(mh3 || '|' || mh4) AS band_key FROM mh
    ),
    edges AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM banded l JOIN banded r ON l.band_key = r.band_key AND l.doc_id < r.doc_id
    ),
    sym AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
    reach AS (
      WITH RECURSIVE reach0(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, s.v FROM reach0 r JOIN sym s ON r.dst = s.u
      )
      SELECT * FROM reach0
    ),
    comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
    sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
    SELECT cluster_size,
           count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removable
    FROM sizes GROUP BY cluster_size
"""


@register("llm_dedup_cluster_sizes", _CLUSTER_SIZES_ORACLE)
def llm_dedup_cluster_sizes(spark, sf_dir):
    """Dedup impact report: the cluster-size histogram of the MinHash-
    LSH near-dup graph — how many singletons, how many k-sized
    families, and how many documents a keep-one policy would remove
    (the number a curation run publishes before committing a dedup).
    Built on the same bucket-star + pointer-jumping components as
    llm_dedup_components; the rollup adds two tiny component-keyed
    aggregations."""
    from .llm.cluster import connected_components
    from .llm.dedup import lsh_star_edges, minhash_from_docs

    d = _t(spark, sf_dir, "documents")
    comp = connected_components(
        d.select("doc_id"), lsh_star_edges(minhash_from_docs(d))
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("long")
        .alias("n_removable"),
    )


# --- week-over-week percent change ---------------------------------------------


@register(
    "ext_percent_change_wow",
    """
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS wk, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(floor(epoch(wk)) AS BIGINT) AS week_epoch,
           n,
           round(CASE WHEN lag(n) OVER w IS NULL THEN NULL
                      ELSE 100.0 * (n - lag(n) OVER w) / lag(n) OVER w
                 END, 4) AS pct_change
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY wk)
    """,
)
def ext_percent_change_wow(spark, sf_dir):
    """Week-over-week percent change per event type — the dashboard
    delta every operational report leads with. Weekly rollup (partial-
    aggregable) then a lag over the small (type x week) series; NULL
    for the first week of each series rather than a fake 0."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    weekly = e.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("wk")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        F.unix_timestamp("wk").cast("long").alias("week_epoch"),
        "n",
        F.round(
            F.when(prev.isNull(), F.lit(None)).otherwise(
                100.0 * (F.col("n") - prev) / prev
            ),
            4,
        ).alias("pct_change"),
    )


# --- cumulative distinct users (running DAU reach) -----------------------------


@register(
    "ext_running_distinct_users",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events
      GROUP BY user_id
    ),
    daily_new AS (
      SELECT first_day AS day, count(*) AS new_users FROM firsts GROUP BY 1
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT CAST(floor(epoch(CAST(d.day AS TIMESTAMP))) AS BIGINT) AS day_epoch,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0))
                OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_users
    FROM days d LEFT JOIN daily_new n ON n.day = d.day
    """,
)
def ext_running_distinct_users(spark, sf_dir):
    """Cumulative distinct-user reach by day — running COUNT(DISTINCT)
    without the (unsupported, and at scale unshuffleable) distinct
    window aggregate: each user contributes on their FIRST day only
    (a user-keyed min), daily new-user counts roll up, and a running
    sum over the small day series yields the cumulative curve. The
    heavy relation is touched once; the global window orders only
    the date spine."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily_new = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = e.select(F.col("ts").cast("date").alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(daily_new, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .select(
            F.unix_timestamp(F.col("day").cast("timestamp")).cast("long").alias(
                "day_epoch"
            ),
            F.col("new_users").cast("long").alias("new_users"),
            F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
        )
    )


# --- nested JSON round-trip ----------------------------------------------------


@register(
    "ext_json_nested_roundtrip",
    """
    SELECT l_orderkey,
           count(*) AS n_lines,
           CAST(sum(l_linenumber) AS BIGINT) AS sum_linenumbers,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem WHERE l_orderkey < 100
    GROUP BY l_orderkey
    """,
)
def ext_json_nested_roundtrip(spark, sf_dir):
    """Nested-JSON round trip: order lines are packed into a JSON
    document per order (struct with an array of line structs via
    to_json), then parsed back with from_json against an explicit
    nested schema and re-flattened with explode — the
    document-interchange path (event payloads, API dumps) exercised
    end to end. The oracle aggregates the flat rows directly, so any
    loss or type drift in the JSON round trip breaks the match."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    packed = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("line"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("lines")
        )
        .select(
            "l_orderkey",
            F.to_json(F.struct(F.col("l_orderkey").alias("okey"), F.col("lines"))).alias(
                "doc"
            ),
        )
    )
    schema = "okey bigint, lines array<struct<line:int, qty:double>>"
    parsed = packed.select(
        F.from_json("doc", schema).alias("j")
    ).select(F.col("j.okey").alias("l_orderkey"), F.explode("j.lines").alias("ln"))
    return parsed.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("ln.line").cast("long").alias("sum_linenumbers"),
        F.round(F.sum("ln.qty"), 4).alias("sum_qty"),
    )


# --- join-key skew diagnostics --------------------------------------------------


@register(
    "ext_skew_metrics",
    """
    WITH per_key AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_rows,
           round(quantile_cont(c::DOUBLE, 0.5), 4) AS p50_rows,
           round(quantile_cont(c::DOUBLE, 0.99), 4) AS p99_rows,
           round(max(c) / avg(c), 4) AS skew_factor
    FROM per_key
    """,
)
def ext_skew_metrics(spark, sf_dir):
    """Join-key skew diagnostics (the pre-flight check before
    partitioning a 100 TB join): per-key cardinality distribution and
    the max/avg skew factor that decides between a plain shuffle, AQE
    skew handling, and an explicit salt. One partial-aggregable count
    plus a key-bounded percentile pass."""
    e = _t(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").cast("long").alias("max_rows"),
        F.round(F.percentile(F.col("c").cast("double"), F.lit(0.5)), 4).alias(
            "p50_rows"
        ),
        F.round(F.percentile(F.col("c").cast("double"), F.lit(0.99)), 4).alias(
            "p99_rows"
        ),
        F.round(F.max("c") / F.avg("c"), 4).alias("skew_factor"),
    )


# --- boilerplate prefix detection ----------------------------------------------


@register(
    "llm_boilerplate_prefix",
    """
    WITH heads AS (
      SELECT doc_id, source,
             array_to_string(list_slice(
               list_filter(string_split(text, ' '), x -> x <> ''), 1, 5), ' ')
               AS head5
      FROM documents
    ),
    freq AS (
      SELECT source, head5, count(*) AS n_docs
      FROM heads GROUP BY source, head5
    )
    SELECT h.doc_id, h.source, f.n_docs AS prefix_family_size,
           CASE WHEN f.n_docs >= 3 THEN 1 ELSE 0 END AS boilerplate_flag
    FROM heads h JOIN freq f ON h.source = f.source AND h.head5 = f.head5
    """,
)
def llm_boilerplate_prefix(spark, sf_dir):
    """Boilerplate-header detection: documents from the same source
    sharing their first 5 words are flagged as template families (the
    scraped-page header/footer pattern C4-style cleaning strips before
    dedup). The prefix fingerprint is an array-slice expression, the
    family count a (source, prefix)-keyed partial-aggregable
    aggregate joined back on its own key — no pairwise comparison
    anywhere."""
    d = _t(spark, sf_dir, "documents")
    head5 = F.array_join(F.slice(words_col(F.col("text")), 1, 5), " ")
    heads = d.select("doc_id", "source", head5.alias("head5"))
    freq = heads.groupBy("source", "head5").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return heads.join(freq, ["source", "head5"]).select(
        "doc_id",
        "source",
        F.col("n_docs").alias("prefix_family_size"),
        F.when(F.col("n_docs") >= 3, 1).otherwise(0).alias("boilerplate_flag"),
    )


# --- robust MAD outlier detection ----------------------------------------------


@register(
    "ext_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, med.med,
             quantile_cont(abs(e.value - med.med), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, med.med
    )
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN abs(e.value - mad.med)
                              > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(mad.med, 4) AS median_value,
           round(mad.mad, 4) AS mad_value
    FROM events e JOIN mad USING (event_type)
    GROUP BY e.event_type, mad.med, mad.mad
    """,
)
def ext_mad_outliers(spark, sf_dir):
    """Robust outlier detection via median absolute deviation (the
    3-sigma rule with median/MAD instead of mean/stddev, x1.4826
    normal-consistency factor) — the anomaly flagger that survives the
    very outliers it hunts, the exactly-checkable complement to the
    reference's IsolationForest (ml_kmeans_anomaly is the model-based
    path; this is the closed-form path). Two grouped exact-percentile
    passes plus a broadcast threshold join; category-bounded state."""
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"))
    )
    flagged = e.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    ).select(
        "event_type",
        "n",
        "n_outliers",
        F.round("med", 4).alias("median_value"),
        F.round("mad", 4).alias("mad_value"),
    )


# --- bounded-window EWMA smoothing ---------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_K = 8  # truncation window: weights below alpha*(1-alpha)^7 ~ 0.025 dropped


def _ewma_terms_sql() -> str:
    ws = [
        f"{_EWMA_ALPHA} * pow({1 - _EWMA_ALPHA}, {k})"
        f" * lag(value, {k}) OVER w"
        for k in range(_EWMA_K)
    ]
    present = [
        f"CASE WHEN lag(value, {k}) OVER w IS NOT NULL THEN "
        f"{_EWMA_ALPHA} * pow({1 - _EWMA_ALPHA}, {k}) ELSE 0 END"
        for k in range(_EWMA_K)
    ]
    return (
        "("
        + " + ".join(f"coalesce({t}, 0)" for t in ws)
        + ") / ("
        + " + ".join(present)
        + ")"
    )


@register(
    "ext_ewma_smoothing",
    f"""
    SELECT event_id, user_id,
           round({_ewma_terms_sql()}, 4) AS ewma
    FROM events WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ext_ewma_smoothing(spark, sf_dir):
    """Exponentially-weighted moving average over each user's reading
    series — the telemetry smoothing pass, truncated to the last 8
    observations so the recursion becomes a FINITE weighted sum of
    lags: w_k = alpha(1-alpha)^k renormalized over the lags actually
    present (series heads aren't biased toward 0). Pure lag
    arithmetic — identical closed form on both engines, no recursion,
    no UDF; one user-keyed sort window at any scale. The infinite-
    history recursive form is deliberately NOT used: its
    (1-alpha)^(-i) rescaling trick overflows on long series."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(_EWMA_K):
        wk = _EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k
        lagv = F.lag("value", k).over(w)
        num = num + F.coalesce(F.lit(wk) * lagv, F.lit(0.0))
        den = den + F.when(lagv.isNotNull(), F.lit(wk)).otherwise(F.lit(0.0))
    return e.select(
        "event_id", "user_id", F.round(num / den, 4).alias("ewma")
    )


# --- contingency crosstab ------------------------------------------------------


@register(
    "ext_crosstab",
    """
    SELECT event_type AS event_type_hi,
           CAST(sum(CASE WHEN value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS lo,
           CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS hi
    FROM events GROUP BY event_type
    """,
)
def ext_crosstab(spark, sf_dir):
    """df.stat.crosstab: the pairwise contingency table (event type x
    value band) — the first table an analyst prints before a chi-square
    test. crosstab's output column names are the RHS values themselves;
    they're projected to fixed names so the schema is stable for the
    driver regardless of value order."""
    e = _t(spark, sf_dir, "events").withColumn(
        "band", F.when(F.col("value") >= 100, "hi").otherwise("lo")
    )
    ct = e.stat.crosstab("event_type", "band")
    return ct.select(
        F.col("event_type_band").alias("event_type_hi"),
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
    )


# --- SQL-exact multinomial Naive Bayes -----------------------------------------

_NB_SPLIT = 400  # train: doc_id < 400; test: the rest


@register(
    "ml_naive_bayes_sql",
    f"""
    WITH words AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    train AS (SELECT * FROM words WHERE doc_id < {_NB_SPLIT}),
    cls AS (
      SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_words
      FROM train GROUP BY lang
    ),
    prior AS (
      SELECT lang, ln(CAST(n_docs AS DOUBLE)
                      / (SELECT sum(n_docs) FROM cls)) AS lp
      FROM cls
    ),
    vocab AS (SELECT count(DISTINCT w) AS v FROM train),
    wc AS (SELECT lang, w, count(*) AS c FROM train GROUP BY lang, w),
    test_words AS (
      SELECT doc_id, lang AS true_lang, w FROM words WHERE doc_id >= {_NB_SPLIT}
    ),
    scored AS (
      SELECT t.doc_id, t.true_lang, cls.lang AS cand,
             sum(ln((coalesce(wc.c, 0) + 1.0)
                    / (cls.n_words + vocab.v))) AS loglik
      FROM test_words t
      CROSS JOIN cls CROSS JOIN vocab
      LEFT JOIN wc ON wc.lang = cls.lang AND wc.w = t.w
      GROUP BY 1, 2, 3, cls.n_words
    ),
    pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang
      FROM (
        SELECT s.doc_id, s.true_lang, s.cand,
               row_number() OVER (
                 PARTITION BY s.doc_id
                 ORDER BY round(s.loglik + p.lp, 10) DESC, s.cand) AS r
        FROM scored s JOIN prior p ON p.lang = s.cand
      ) WHERE r = 1
    )
    SELECT count(*) AS n_test,
           CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred
    """,
)
def ml_naive_bayes_sql(spark, sf_dir):
    """Multinomial Naive Bayes language classifier, trained and scored
    ENTIRELY in closed-form relational algebra (add-1 smoothing):
    class priors and word-given-class log-probabilities are grouped
    counts, scoring is a sum of joined log terms, argmax is a window —
    byte-identical across engines, so the oracle checks the WHOLE
    train/score/evaluate loop exactly (the regr_* idiom extended to
    classification). Scale shape: wc is (class x vocab)-bounded; test
    words join it on (lang, w) keys; no driver-side model object
    exists at all."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang", F.explode(words_col(F.col("text"))).alias("w")
    )
    train = words.filter(F.col("doc_id") < _NB_SPLIT)
    # ONE shuffle over the exploded train corpus: the (lang, word)
    # count table. Everything class-level re-derives from wc's
    # (class x vocab)-bounded output instead of re-exploding the
    # corpus (n_words = sum of c; vocabulary = distinct w); per-class
    # doc counts come from the unexploded documents scan filtered the
    # same way the oracle's train_words CTE is (docs with >= 1 token,
    # via size(words_col) — an empty doc must not count toward the
    # prior on only one engine).
    wc = train.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    cls_words = wc.groupBy("lang").agg(F.sum("c").alias("n_words"))
    vocab = wc.agg(F.countDistinct("w").alias("v"))
    cls_docs = (
        d.filter(
            (F.col("doc_id") < _NB_SPLIT) & (F.size(words_col(F.col("text"))) > 0)
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total_docs = cls_docs.agg(F.sum("n_docs").alias("td"))
    prior = cls_docs.crossJoin(F.broadcast(total_docs)).select(
        F.col("lang").alias("cand"),
        F.log(F.col("n_docs").cast("double") / F.col("td")).alias("lp"),
    )
    test_words = words.filter(F.col("doc_id") >= _NB_SPLIT).select(
        "doc_id", F.col("lang").alias("true_lang"), "w"
    )
    cand = cls_words.select(F.col("lang").alias("cand"), "n_words")
    # wc is (class x vocabulary)-bounded — broadcast it so the test
    # corpus is never shuffled for the score join (the corpus-never-
    # shuffles rule every retrieval entry in this engine follows)
    scored = (
        test_words.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(vocab))
        .join(
            F.broadcast(wc.select(F.col("lang").alias("cand"), "w", "c")),
            ["cand", "w"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand", "n_words")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.col("n_words") + F.col("v"))
                )
            ).alias("loglik")
        )
    )
    # Rank on a fixed-precision score: float sum order differs between
    # Spark's partition-dependent aggregation and DuckDB, so near-tied
    # classes could argmax differently sub-ulp; rounding to 1e-10 with
    # the cand tiebreak pins one cross-engine answer.
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("loglik") + F.col("lp"), 10).desc(), F.col("cand").asc()
    )
    pred = (
        scored.join(F.broadcast(prior), "cand")
        .withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") == 1)
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(F.when(F.col("cand") == F.col("true_lang"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )


# --- chi-square independence test ----------------------------------------------


@register(
    "ml_chi_square_assoc",
    """
    WITH obs AS (
      SELECT event_type,
             CASE WHEN value >= 100 THEN 1 ELSE 0 END AS hi,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT event_type, sum(o) AS row_n FROM obs GROUP BY event_type
    ),
    cols AS (SELECT hi, sum(o) AS col_n FROM obs GROUP BY hi),
    tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs)
    SELECT round(sum(pow(o - row_n * col_n / n, 2) / (row_n * col_n / n)), 4)
             AS chi2,
           CAST(( (SELECT count(*) FROM margins) - 1)
                * ((SELECT count(*) FROM cols) - 1) AS BIGINT) AS dof
    FROM obs JOIN margins USING (event_type) JOIN cols USING (hi) CROSS JOIN tot
    """,
)
def ml_chi_square_assoc(spark, sf_dir):
    """Chi-square test of independence (event type vs high-value flag)
    — the feature-screening statistic a modeling pipeline computes
    before one-hot encoding categoricals. Computed as pure SQL moments
    (observed vs expected from the margins), identically in both
    engines; the contingency table is category-bounded, so the whole
    test is one partial-aggregable pass at any scale."""
    e = _t(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", (F.col("value") >= 100).cast("int").alias("hi")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = obs.groupBy("event_type").agg(F.sum("o").alias("row_n"))
    cols = obs.groupBy("hi").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").cast("double").alias("n"))
    joined = (
        obs.join(margins, "event_type")
        .join(F.broadcast(cols), "hi")
        .crossJoin(F.broadcast(tot))
    )
    expected = F.col("row_n") * F.col("col_n") / F.col("n")
    chi2 = joined.agg(
        F.round(F.sum(F.pow(F.col("o") - expected, 2) / expected), 4).alias("chi2")
    )
    dof = margins.count() - 1, cols.count() - 1
    return chi2.select(
        "chi2", F.lit(dof[0] * dof[1]).cast("long").alias("dof")
    )


# --- frequent itemsets (FPGrowth vs SQL combinatorics) -------------------------


@register(
    "ml_fpgrowth_itemsets",
    """
    WITH baskets AS (
      SELECT user_id, list(DISTINCT event_type) AS items FROM events
      GROUP BY user_id
    ),
    n AS (SELECT count(*) AS n_baskets FROM baskets),
    singles AS (
      SELECT event_type AS itemset, count(DISTINCT user_id) AS freq
      FROM events GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type || '+' || b.event_type AS itemset,
             count(*) AS freq
      FROM (SELECT DISTINCT user_id, event_type FROM events) a
      JOIN (SELECT DISTINCT user_id, event_type FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1
    ),
    all_sets AS (
      SELECT itemset, freq FROM singles UNION ALL SELECT itemset, freq FROM pairs
    )
    SELECT itemset, freq FROM all_sets CROSS JOIN n
    WHERE freq >= 0.3 * n_baskets
    """,
)
def ml_fpgrowth_itemsets(spark, sf_dir):
    """Frequent-itemset mining (MLlib FPGrowth, minSupport 0.3) over
    per-user event-type baskets, reported for itemsets of size <= 2 —
    the co-occurrence catalog behind recommender/market-basket
    features. FPGrowth's output is EXACT (a deterministic set for a
    given support threshold), so the oracle recomputes it with SQL
    combinatorics (distinct-pair joins); itemsets are canonicalized
    as sorted '+'-joined strings to stay driver-hashable. Baskets are
    user-keyed partial-aggregable collect_sets; the item domain is
    bounded (5 event types), so the lattice is tiny at any scale."""
    from pyspark.ml.fpm import FPGrowth

    e = _t(spark, sf_dir, "events")
    baskets = e.groupBy("user_id").agg(
        F.collect_set("event_type").alias("items")
    )
    model = FPGrowth(
        itemsCol="items", minSupport=0.3, minConfidence=0.5
    ).fit(baskets)
    return (
        model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            F.array_join(F.array_sort("items"), "+").alias("itemset"),
            F.col("freq"),
        )
    )


# --- ALS collaborative filtering (invariant-checked) ---------------------------


@register(
    "ml_als_recommend",
    """
    SELECT count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_items,
           true AS rmse_below_quarter_mean
    FROM events
    """,
)
def ml_als_recommend(spark, sf_dir):
    """ALS matrix factorization (MLlib, rank 4, fixed seed) on the
    user x event-type engagement matrix (mean value as the implicit
    rating) — the collaborative-filtering surface. Factorization
    output is seed-stable but float-iterative, so the driver-checkable
    row is the INVARIANT: reconstruction RMSE on the training matrix
    must land below a quarter of the global mean rating (the matrix is
    near-complete at 5 items, so a rank-4 factorization must fit it
    well), plus the matrix dimensions. The oracle pins the dimensions
    and the invariant."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import StringIndexer
    from pyspark.ml.recommendation import ALS

    e = _t(spark, sf_dir, "events")
    ratings = e.groupBy("user_id", "event_type").agg(
        F.avg("value").alias("rating")
    )
    idx = StringIndexer(inputCol="event_type", outputCol="item_id").fit(ratings)
    r = idx.transform(ratings).select(
        F.col("user_id").cast("int").alias("user"),
        F.col("item_id").cast("int").alias("item"),
        F.col("rating").cast("float"),
    )
    als = ALS(
        rank=4, maxIter=8, seed=7, regParam=0.05,
        userCol="user", itemCol="item", ratingCol="rating",
        coldStartStrategy="drop",
    )
    pred = als.fit(r).transform(r)
    rmse = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    ).evaluate(pred)
    mean_rating = r.agg(F.avg("rating")).collect()[0][0]
    dims = r.agg(
        F.countDistinct("user").alias("n_users"),
        F.countDistinct("item").alias("n_items"),
    ).collect()[0]
    return spark.createDataFrame(
        [(dims.n_users, dims.n_items, bool(rmse < 0.25 * mean_rating))],
        "n_users bigint, n_items bigint, rmse_below_quarter_mean boolean",
    )


# --- watermarked left-outer stream-stream join ---------------------------------


@register(
    "stream_stream_join_outer",
    """
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    wm AS (
      SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
             - INTERVAL 2 HOUR AS w
    )
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch
    FROM c JOIN p ON c.user_id = p.user_id
                 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
    UNION ALL
    SELECT c.user_id, c.event_id, CAST(NULL AS BIGINT),
           CAST(floor(epoch(c.ts)) AS BIGINT), CAST(NULL AS BIGINT)
    FROM c, wm
    WHERE c.ts + INTERVAL 30 MINUTE < wm.w
      AND NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = c.user_id
          AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
      )
    """,
)
def stream_stream_join_outer(spark, sf_dir):
    """Watermarked LEFT OUTER stream-stream join — the hard streaming
    surface: matches emit immediately, but an UNMATCHED click can only
    emit its null row once the watermark proves no purchase can still
    arrive (click evicted when wm > c_ts + 30min, where the global wm
    is min(per-side max event time) - 2h, advanced by the final
    no-data micro-batch availableNow runs). The oracle states exactly
    that: the batch left join, with null rows RESTRICTED to clicks
    whose join window closed below the terminal watermark — clicks
    newer than that hold their answer until more data arrives, which
    is correct streaming semantics, not data loss (verified row-level
    against the batch join at build time: only the terminal-window
    clicks differ)."""
    import uuid

    from .session import tune_session
    from .streaming.windows import events_testdata_stream

    tune_session(spark)

    def side(event_type, alias):
        return (
            events_testdata_stream(spark, sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user_id"),
                F.col("event_id").alias(f"{alias}_event_id"),
                F.col("ts").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "2 hours")
        )

    joined = side("click", "c").join(
        side("purchase", "p"),
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(
        F.col("c_user_id").alias("user_id"),
        F.col("c_event_id").alias("click_id"),
        F.col("p_event_id").alias("purchase_id"),
        F.unix_timestamp("c_ts").cast("long").alias("click_epoch"),
        F.unix_timestamp("p_ts").cast("long").alias("purchase_epoch"),
    )
    name = f"stream_ssoj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- n-gram containment (asymmetric near-dup) ----------------------------------


@register(
    "llm_ngram_containment",
    """
    WITH w3 AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(ws, i, i + 2), ' ') AS shingle
      FROM (
        SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
        FROM (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents WHERE doc_id < 40
        )
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM w3 GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_inter
      FROM w3 a JOIN w3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b,
           round(CAST(n_inter AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    """,
)
def llm_ngram_containment(spark, sf_dir):
    """Containment (|A∩B| / min(|A|,|B|)) over word-3-gram sets — the
    ASYMMETRIC near-dup measure that catches a document embedded
    inside a larger one, where Jaccard dilutes toward zero (the quote/
    boilerplate-inclusion case Jaccard-only dedup misses). Same
    shingle-intersection machinery as llm_ngram_jaccard (candidate
    pairs from shared shingles only, never all-pairs); only the
    normalizer changes."""
    from .llm.dedup import word_ngrams

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sh = word_ngrams(d)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_inter").cast("double") / F.least("sza", "szb"), 4
            ).alias("containment"),
        )
    )


# --- character-distribution entropy --------------------------------------------


@register(
    "llm_char_entropy",
    """
    WITH chars AS (
      SELECT doc_id, unnest(string_split(regexp_replace(text, ' ', '', 'g'), ''))
               AS ch
      FROM documents
    ),
    freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
    tot AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM freq GROUP BY doc_id)
    SELECT doc_id,
           round(-sum((c / n) * ln(c / n)), 4) AS char_entropy,
           count(*) AS n_distinct_chars
    FROM freq JOIN tot USING (doc_id)
    GROUP BY doc_id
    """,
)
def llm_char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per document (spaces
    excluded) — the cheap gibberish/boilerplate detector quality
    filters run before anything tokenizes: near-zero entropy flags
    repeated-character junk, unusually high flags binary-in-text.
    One explode into a (doc, char)-keyed partial-aggregable count;
    the alphabet is bounded, so the per-doc state is tiny at any
    corpus size."""
    d = _t(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.col("text"), " ", ""), "")
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").cast("double").alias("n"))
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum((F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n"))), 4
            ).alias("char_entropy"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
        )
    )


# --- temperature-scaled source mixing ------------------------------------------


@register(
    "llm_source_temperature_mix",
    """
    WITH counts AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM counts),
    shares AS (
      SELECT source, n_docs,
             n_docs / total AS raw_share,
             pow(n_docs / total, 0.7) AS unnorm
      FROM counts CROSS JOIN tot
    )
    SELECT source, n_docs,
           round(raw_share, 4) AS raw_share,
           round(unnorm / (SELECT sum(unnorm) FROM shares), 4) AS temp_share,
           CAST(round((unnorm / (SELECT sum(unnorm) FROM shares)) * 10000)
                AS BIGINT) AS sample_quota_10k
    FROM shares
    """,
)
def llm_source_temperature_mix(spark, sf_dir):
    """Temperature-scaled source mixing (tau = 0.7): the exponentiated
    re-weighting multilingual/multi-source training runs use to
    up-sample small sources without flattening big ones (share^tau,
    renormalized), plus the integer sample quota out of 10k — the
    numbers a data-mixing config actually records. Pure arithmetic
    over a source-keyed count (partial-aggregable; the normalization
    constant is a 1-row broadcast)."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("total"))
    shares = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.col("n_docs") / F.col("total")).alias("raw_share"),
        F.pow(F.col("n_docs") / F.col("total"), 0.7).alias("unnorm"),
    )
    z = shares.agg(F.sum("unnorm").alias("z"))
    return shares.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round("raw_share", 4).alias("raw_share"),
        F.round(F.col("unnorm") / F.col("z"), 4).alias("temp_share"),
        F.round(F.col("unnorm") / F.col("z") * 10000)
        .cast("long")
        .alias("sample_quota_10k"),
    )


# --- forward as-of join --------------------------------------------------------


@register(
    "ext_asof_join_forward",
    """
    SELECT p.event_id, p.user_id, CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_epoch,
           p.value,
           first(v.event_id ORDER BY v.ts, v.event_id) AS next_event_id,
           first(v.value ORDER BY v.ts, v.event_id) AS next_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    GROUP BY p.event_id, p.user_id, p.ts, p.value
    """,
)
def ext_asof_join_forward(spark, sf_dir):
    """FORWARD as-of join: for each purchase, the user's EARLIEST view
    at-or-after it — what-did-they-do-next attribution, the mirror of
    ext_asof_join's latest-before lookup. Same union+window shape
    (operators/joins.asof_join_forward), one shuffle on user_id,
    first(ignorenulls) over the FOLLOWING frame. event_id breaks exact
    (user_id, ts) ties deterministically (smallest wins); the oracle
    pins the SAME rule via first(x ORDER BY ts, event_id) over a
    range-predicate left join — DuckDB's native ASOF reads better but
    has no tiebreak syntax, and the 10x differential replica (which
    mints exact ties across copies) proved the two engines then pick
    different tie representatives."""
    from .operators.joins import asof_join_forward

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    out = asof_join_forward(
        purchases, views, "user_id", "ts", "ts", ["event_id", "value"],
        right_tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp(F.col("ts")).cast("long").alias("ts_epoch"),
        "value",
        "next_event_id",
        "next_value",
    )


# --- TF-IDF keyword extraction -------------------------------------------------


@register(
    "llm_tfidf_topk_terms",
    """
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, w, round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
      FROM tf JOIN df USING (w) CROSS JOIN n
    )
    SELECT doc_id, w AS term, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT doc_id, w, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, w) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def llm_tfidf_topk_terms(spark, sf_dir):
    """TF-IDF keyword extraction: the 3 most characteristic terms per
    document (tf x ln(N/df), deterministic term tiebreak) — the
    classic document-labeling pass a curation pipeline runs for
    clustering and topic mixes. Scale shape: tf is a (doc, term)
    partial-aggregable count off ONE explode; df re-aggregates tf by
    term (vocabulary-bounded); N is a 1-row broadcast; top-3 per doc
    is a WindowGroupLimit-prunable window, never a global sort."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("w").alias("term"), "tfidf", "rnk")
    )


# --- grouped exact percentiles -------------------------------------------------


@register(
    "ext_grouped_median",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS median_value,
           round(quantile_cont(value, 0.9), 4) AS p90_value,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def ext_grouped_median(spark, sf_dir):
    """Exact percentiles as GROUPED aggregates (median + p90 per
    event type) — the per-segment latency/size SLO readout. Exact
    percentile (not approx) matches DuckDB's quantile_cont
    interpolation; the grouped form is partial-aggregable by
    partition, unlike a global sort."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90_value"),
        F.count(F.lit(1)).alias("n"),
    )


# --- exact DECIMAL money arithmetic --------------------------------------------


@register(
    "ext_decimal_exact",
    """
    SELECT event_type,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST((sum(CAST(round(value * 100) AS BIGINT)) * 10000
                 + count(*) // 2) // count(*) AS BIGINT) AS avg_microdollars
    FROM events GROUP BY event_type
    """,
)
def ext_decimal_exact(spark, sf_dir):
    """Exact money arithmetic with NO floating point past the per-row
    cents reconstruction: integer cents are summed exactly (DECIMAL(38,0)
    accumulator on the Spark side so the sum cannot overflow at 100 TB;
    DuckDB promotes to HUGEINT on its own), and the average is an
    all-integer half-up division to microdollar precision —
    (sum_cents * 10000 + n DIV 2) DIV n. The r5 driver proved the
    previous formulation wrong: DuckDB's avg(DECIMAL) silently returns
    DOUBLE, so any oracle avg over decimals transits float and rounds
    differently at boundary values. Integer DIV truncates toward zero
    identically in both engines (verified: -7//2 = -3 in DuckDB,
    -7 div 2 = -3 in Spark), so parity is exact digit-for-digit."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("decimal(38,0)")
    g = e.groupBy("event_type").agg(
        F.sum(cents).alias("_sc"), F.count(F.lit(1)).alias("_n")
    )
    return g.select(
        "event_type",
        F.col("_sc").cast("long").alias("total_cents"),
        F.expr(
            "CAST((_sc * 10000 + _n div 2) div _n AS BIGINT)"
        ).alias("avg_microdollars"),
    )


# --- bitwise aggregates --------------------------------------------------------


@register(
    "ext_bitwise_agg",
    """
    SELECT event_type,
           bit_and(CAST(round(value * 100) AS BIGINT)) AS all_bits,
           bit_or(CAST(round(value * 100) AS BIGINT)) AS any_bits,
           bit_xor(CAST(round(value * 100) AS BIGINT)) AS parity_bits
    FROM events GROUP BY event_type
    """,
)
def ext_bitwise_agg(spark, sf_dir):
    """Bitwise aggregate surface (bit_and/bit_or/bit_xor) — flag-mask
    rollups and parity checksums over integer codes. Order-insensitive
    by construction (bitwise ops commute), so cross-engine parity is
    exact with no rounding convention needed."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return e.groupBy("event_type").agg(
        F.bit_and(cents).alias("all_bits"),
        F.bit_or(cents).alias("any_bits"),
        F.bit_xor(cents).alias("parity_bits"),
    )


# --- NULL semantics surface ----------------------------------------------------


@register(
    "ext_null_semantics",
    """
    SELECT event_id,
           CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END AS null_safe_eq,
           coalesce(a, b, -1) AS first_non_null,
           CASE WHEN a IS NULL THEN 'was_null' ELSE 'had_value' END AS a_state
    FROM (
      SELECT event_id,
             nullif(CAST(round(value * 100) AS BIGINT) % 7, 3) AS a,
             nullif(CAST(round(value * 100) AS BIGINT) % 5, 2) AS b
      FROM events
    )
    """,
)
def ext_null_semantics(spark, sf_dir):
    """Three-valued-logic surface in one query: null-safe equality
    (<=> / IS NOT DISTINCT FROM), nullif-manufactured NULLs, coalesce
    chains, and nvl2 branching — the semantics corner where engines
    disagree silently. All integer arithmetic; every NULL is
    deterministic (nullif on a modulus), so the differential check
    exercises NULL propagation, not data luck."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    a = F.nullif(cents % 7, F.lit(3))
    b = F.nullif(cents % 5, F.lit(2))
    return e.select(
        "event_id",
        F.when(a.eqNullSafe(b), 1).otherwise(0).alias("null_safe_eq"),
        F.coalesce(a, b, F.lit(-1)).alias("first_non_null"),
        F.nvl2(a, F.lit("had_value"), F.lit("was_null")).alias("a_state"),
    )


# --- Hive-style LATERAL VIEW SQL surface ---------------------------------------


@register(
    "ext_lateral_view_sql",
    """
    SELECT doc_id, w, count(*) AS n
    FROM (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents WHERE doc_id < 20
    )
    GROUP BY doc_id, w
    """,
)
def ext_lateral_view_sql(spark, sf_dir):
    """Hive-style LATERAL VIEW explode() SQL syntax — the third
    generator spelling next to DataFrame .explode and ANSI lateral
    joins, still the dominant form in migrated warehouse SQL. Same
    Generate physical node; the SQL-text path is what's under test."""
    from .registry_ext2 import _views

    _views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT doc_id, w, count(*) AS n
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS w
        WHERE doc_id < 20 AND w <> ''
        GROUP BY doc_id, w
        """
    )


# --- MinHash LSH band tuning ---------------------------------------------------

_BAND_SHINGLES_SQL = """
  sh AS (
    SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
      FROM documents
    )
  ),
  mh AS (
    SELECT doc_id,
           min(substr(md5(shingle), 1, 8))  AS mh1, min(substr(md5(shingle), 9, 8))  AS mh2,
           min(substr(md5(shingle), 17, 8)) AS mh3, min(substr(md5(shingle), 25, 8)) AS mh4
    FROM sh GROUP BY doc_id
  )
"""


@register(
    "llm_minhash_band_tuning",
    f"""
    WITH {_BAND_SHINGLES_SQL},
    b41 AS (
      SELECT doc_id, md5('b1|' || mh1) AS k FROM mh
      UNION ALL SELECT doc_id, md5('b2|' || mh2) FROM mh
      UNION ALL SELECT doc_id, md5('b3|' || mh3) FROM mh
      UNION ALL SELECT doc_id, md5('b4|' || mh4) FROM mh
    ),
    b22 AS (
      SELECT doc_id, md5('b1|' || mh1 || '|' || mh2) AS k FROM mh
      UNION ALL SELECT doc_id, md5('b2|' || mh3 || '|' || mh4) FROM mh
    ),
    b14 AS (
      SELECT doc_id,
             md5('b1|' || mh1 || '|' || mh2 || '|' || mh3 || '|' || mh4) AS k
      FROM mh
    ),
    p41 AS (SELECT count(*) AS n FROM (
      SELECT DISTINCT l.doc_id, r.doc_id FROM b41 l
      JOIN b41 r ON l.k = r.k AND l.doc_id < r.doc_id)),
    p22 AS (SELECT count(*) AS n FROM (
      SELECT DISTINCT l.doc_id, r.doc_id FROM b22 l
      JOIN b22 r ON l.k = r.k AND l.doc_id < r.doc_id)),
    p14 AS (SELECT count(*) AS n FROM (
      SELECT DISTINCT l.doc_id, r.doc_id FROM b14 l
      JOIN b14 r ON l.k = r.k AND l.doc_id < r.doc_id))
    SELECT '4x1' AS config, 4 AS n_bands, 1 AS rows_per_band, n AS n_pairs FROM p41
    UNION ALL
    SELECT '2x2', 2, 2, n FROM p22
    UNION ALL
    SELECT '1x4', 1, 4, n FROM p14
    """,
)
def llm_minhash_band_tuning(spark, sf_dir):
    """LSH banding parameter sweep: candidate-pair counts for the
    three band layouts of a 4-component MinHash signature (4 bands x
    1 row = recall-leaning, 2x2 = balanced, 1x4 = precision-leaning)
    — the probe a dedup pipeline runs to place the S-curve before
    committing a config at full scale. The signature pipeline is
    materialized ONCE (localCheckpoint) and each layout is a
    band-keyed self-equi-join over its own exploded key set (band
    index is baked into the key, so no cross-band collisions); counts
    decrease monotonically as rows-per-band grows."""
    from .llm.dedup import minhash_from_docs

    d = _t(spark, sf_dir, "documents")
    sigs = minhash_from_docs(d).localCheckpoint(eager=True)

    def pairs_count(groups, label, n_bands, rows_per_band):
        keys = [
            F.md5(
                F.concat_ws("|", F.lit(f"b{bi}"), *[F.col(c) for c in cols])
            )
            for bi, cols in enumerate(groups, 1)
        ]
        banded = sigs.select("doc_id", F.explode(F.array(*keys)).alias("k"))
        pairs = (
            banded.alias("l")
            .join(
                banded.alias("r"),
                (F.col("l.k") == F.col("r.k"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
            .distinct()
        )
        return pairs.agg(F.count(F.lit(1)).alias("n_pairs")).select(
            F.lit(label).alias("config"),
            F.lit(n_bands).alias("n_bands"),
            F.lit(rows_per_band).alias("rows_per_band"),
            "n_pairs",
        )

    return (
        pairs_count([["mh1"], ["mh2"], ["mh3"], ["mh4"]], "4x1", 4, 1)
        .unionAll(pairs_count([["mh1", "mh2"], ["mh3", "mh4"]], "2x2", 2, 2))
        .unionAll(pairs_count([["mh1", "mh2", "mh3", "mh4"]], "1x4", 1, 4))
    )


# --- re-aggregable HLL sketches ------------------------------------------------


@register(
    "ext_hll_sketch_merge",
    """
    SELECT count(DISTINCT event_id) AS n_exact,
           true AS merged_within_5pct,
           true AS direct_within_5pct
    FROM events
    """,
)
def ext_hll_sketch_merge(spark, sf_dir):
    """Re-aggregable distinct-count sketches (Spark 4 Apache
    DataSketches HLL): per-shard sketches merged with hll_union_agg
    answer the same global NDV a direct single-pass sketch does — the
    property that lets a 100 TB rollup keep pre-aggregated sketch
    columns per partition. Merged and direct estimates are NOT
    bit-identical (union promotes sparse shard sketches into a dense
    target, so register states differ — measured 0.2-2.9% from exact
    across sf0.001-0.1); both must land within the 5% band (~3 sigma
    at lgConfigK=12), computed in-query with the oracle pinning the
    invariants true alongside the exact NDV."""
    e = _t(spark, sf_dir, "events")
    shard = e.withColumn("g", F.col("user_id") % 8)
    per_shard = shard.groupBy("g").agg(
        F.hll_sketch_agg("event_id").alias("sk")
    )
    merged = per_shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("event_id")).alias("direct_est"),
        F.countDistinct("event_id").alias("n_exact"),
    )
    return (
        direct.crossJoin(F.broadcast(merged))
        .select(
            "n_exact",
            (
                F.abs(F.col("merged_est") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("merged_within_5pct"),
            (
                F.abs(F.col("direct_est") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("direct_within_5pct"),
        )
    )


# --- snapshot time travel ------------------------------------------------------


@register(
    "ext_snapshot_time_travel",
    """
    SELECT 1 AS version, count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT 2, count(*),
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    FROM orders WHERE o_orderkey < 2000
    """,
)
def ext_snapshot_time_travel(spark, sf_dir):
    """Snapshot-isolation time travel over a plain parquet layout:
    append-only file commits tracked in a per-version manifest (the
    Iceberg/Delta mechanism with the metadata layer inlined), reads
    resolved AS OF each version from its file list — never by
    directory listing, so an in-flight append can't tear a read. Both
    snapshots are aggregated from their manifests and must equal the
    oracle's filter-defined versions."""
    import tempfile

    base = tempfile.mkdtemp(prefix="time_travel_")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    o.filter(F.col("o_orderkey") < 1000).write.parquet(f"{base}/commit1")
    o.filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)
    ).write.parquet(f"{base}/commit2")
    manifest = {1: [f"{base}/commit1"], 2: [f"{base}/commit1", f"{base}/commit2"]}

    def snapshot(version: int):
        return (
            spark.read.parquet(*manifest[version])
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("sum_cents"),
            )
            .select(F.lit(version).alias("version"), "n_rows", "sum_cents")
        )

    return snapshot(1).unionAll(snapshot(2))


# --- filtered vector search ----------------------------------------------------


@register(
    "llm_ann_filtered_topk",
    """
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, label AS qlabel, v AS qv
      FROM e WHERE vec_id < 10
    ),
    scored AS (
      SELECT query_id, e.vec_id AS neighbor_id,
             round(list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(v, v))), 4) AS cosine_sim
      FROM q JOIN e ON e.vec_id <> q.query_id AND e.label <> q.qlabel
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def llm_ann_filtered_topk(spark, sf_dir):
    """FILTERED vector search — top-5 cosine neighbors restricted by a
    metadata predicate (neighbor label must differ from the query's
    label; the hard-negative-mining query contrastive training runs,
    and the filtered-search feature every vector store advertises).
    The predicate is applied BEFORE ranking (pre-filter, exact), not
    post-filtering a larger top-k (which can return < k rows). Same
    scale shape as the exact baseline: bounded query set broadcast,
    corpus scanned once, per-query top-k via partial WindowGroupLimit;
    the label predicate rides the broadcast join condition."""
    from pyspark.sql.window import Window

    from .llm.similarity import _as_double, cosine

    e = _t(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "label", _as_double(F.col("embedding")).alias("v"))
    q = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    scored = base.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id")) & (F.col("label") != F.col("qlabel")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


# --- Observation API (in-flight metrics) ---------------------------------------


@register(
    "ext_observation_metrics",
    """
    SELECT count(*) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT)
             AS n_discounted
    FROM lineitem WHERE l_quantity > 25
    """,
)
def ext_observation_metrics(spark, sf_dir):
    """Spark Observation API: named accumulator-backed metrics
    collected DURING a query's execution (df.observe) — the
    zero-extra-pass row-count / data-quality counters a production
    pipeline attaches to every write job. The observed metrics are
    returned as a 1-row DataFrame and must equal the oracle's
    recomputation, proving the in-flight metrics see exactly the rows
    the query processed (no sampling, no approximation)."""
    from pyspark.sql import Observation

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 25)
    obs = Observation("etl_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_cents"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_cents"], m["n_discounted"])],
        "n_rows bigint, sum_cents bigint, n_discounted bigint",
    )


# --- streaming checkpoint resume (exactly-once restart) ------------------------


@register(
    "stream_checkpoint_resume",
    """
    SELECT user_id, count(*) AS n
    FROM events WHERE user_id < 40 GROUP BY user_id
    """,
)
def stream_checkpoint_resume(spark, sf_dir):
    """Exactly-once RESTART semantics: the stream runs availableNow
    over the first half of the data, terminates, MORE files land, and
    a second query starts from the SAME checkpoint — the restarted
    stream must resume from the recorded offsets, reprocessing
    nothing, and the compacted CDC state must equal the plain batch
    aggregate over ALL the data (the oracle). This is the
    crash-recovery contract that makes foreachBatch upserts safe to
    re-run — checkpointed source offsets + last-write-wins sink."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql.window import Window

    from .session import tune_session

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="stream_resume_")
    stage, src, sink, ckpt = (
        f"{work}/stage",
        f"{work}/src",
        f"{work}/sink",
        f"{work}/ckpt",
    )
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    e.select("event_id", "user_id").repartition(4).write.parquet(stage)
    files = sorted(
        f for f in __import__("os").listdir(stage) if f.endswith(".parquet")
    )
    __import__("os").makedirs(src)

    def _run_stream() -> None:
        stream = (
            spark.readStream.schema("event_id bigint, user_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))

        def _upsert(batch, batch_id: int) -> None:
            batch.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink)

        q = (
            agg.writeStream.foreachBatch(_upsert)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .queryName(f"resume_{uuid.uuid4().hex[:8]}")
            .start()
        )
        q.awaitTermination()

    # first run: half the files; second run: the rest land, same checkpoint
    half = max(1, len(files) // 2)
    for f in files[:half]:
        shutil.copy(f"{stage}/{f}", f"{src}/{f}")
    _run_stream()
    for f in files[half:]:
        shutil.copy(f"{stage}/{f}", f"{src}/{f}")
    _run_stream()

    cdc = spark.read.parquet(sink)
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    return (
        cdc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n")
    )


# --- tokenizer vocab coverage curve -------------------------------------------


@register(
    "llm_vocab_coverage",
    """
    WITH words AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS c FROM words GROUP BY w),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM freq
    ),
    total AS (
      SELECT CAST(sum(c) AS BIGINT) AS tot, count(*) AS vocab_size FROM freq
    )
    SELECT k,
           round(CAST(sum(CASE WHEN rn <= k THEN c ELSE 0 END) AS DOUBLE)
                 / max(tot), 4) AS coverage,
           max(vocab_size) AS vocab_size
    FROM ranked
    CROSS JOIN total
    CROSS JOIN (SELECT unnest([5, 10, 20]) AS k)
    GROUP BY k
    """,
)
def llm_vocab_coverage(spark, sf_dir):
    """Tokenizer-design coverage curve: what fraction of all corpus
    tokens the top-k vocabulary covers, at k = 5/10/20 — the number a
    tokenizer team reads before choosing vocab size. The corpus-wide
    frequency table is a partial-aggregable word-keyed count; the
    global rank window then runs over the VOCABULARY (bounded by
    distinct words, not corpus rows — documented single-partition
    sort, the same bound every tokenizer trainer accepts), and the
    coverage cut is a conditional sum per k."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = freq.select(
        "c", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w"))).alias("rn")
    )
    total = freq.agg(
        F.sum("c").alias("tot"), F.count(F.lit(1)).alias("vocab_size")
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(10), F.lit(20))).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.round(
                F.sum(F.when(F.col("rn") <= F.col("k"), F.col("c")).otherwise(0)).cast(
                    "double"
                )
                / F.max("tot"),
                4,
            ).alias("coverage"),
            F.max("vocab_size").alias("vocab_size"),
        )
    )


# --- Spark 4 native XML source -------------------------------------------------


@register(
    "ext_source_xml",
    """
    SELECT id, name, CAST(price AS DOUBLE) AS price FROM (VALUES
      (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', 3.5),
      (4, 'delta', 4.5), (5, 'epsilon', 5.5)
    ) AS t(id, name, price)
    """,
)
def ext_source_xml(spark, sf_dir):
    """Spark 4 built-in XML source (rowTag record splitting + explicit
    schema — no external package since 4.0). The file is written here
    so the entry is hermetic; the oracle is the literal payload. Same
    digest-checked round-trip pattern as ext_source_jsonl/orc."""
    import tempfile

    path = tempfile.mkdtemp(prefix="xml_src_") + "/data.xml"
    rows = [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", 3.5),
            (4, "delta", 4.5), (5, "epsilon", 5.5)]
    with open(path, "w") as f:
        f.write("<rows>\n")
        for i, name, price in rows:
            f.write(
                f"  <row><id>{i}</id><name>{name}</name>"
                f"<price>{price}</price></row>\n"
            )
        f.write("</rows>\n")
    return (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema("id long, name string, price double")
        .load(path)
    )


# --- hidden _metadata columns (file lineage) -----------------------------------


@register(
    "ext_metadata_columns",
    """
    SELECT event_type, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def ext_metadata_columns(spark, sf_dir):
    """Hidden _metadata columns as file lineage: events are written
    partitioned by event_type, read back WITHOUT the partition column
    projected, and each row's origin is recovered purely from
    _metadata.file_path — the which-file-did-this-row-come-from
    audit every warehouse debugging session needs. The per-origin
    counts must equal the plain per-type counts (the oracle), proving
    the hidden column binds to real scan-level file paths."""
    import tempfile

    out = tempfile.mkdtemp(prefix="meta_cols_") + "/by_type"
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.write.partitionBy("event_type").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"event_type=([^/]+)/", 1
            ).alias("event_type")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- BPE-style tokenizer induction: first merge step ---------------------------


@register(
    "llm_bpe_merge_step",
    """
    WITH ws AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    pairs AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS pair
      FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM ws WHERE len(ws) > 1)
    )
    SELECT pair, count(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def llm_bpe_merge_step(spark, sf_dir):
    """One merge step of BPE-style tokenizer induction: count every
    adjacent symbol pair across the corpus and emit the 20 most
    frequent (the pair a real BPE trainer would merge next, plus
    runners-up; deterministic pair-text tiebreak). The pair stream is
    zip_with over two shifted slices of the SAME word array — a single
    Generate per document, no posexplode self-join, no window — then
    one pair-keyed partial-aggregable count. At 100 TB this is exactly
    one shuffle of (pair, partial count), the minimum any global
    frequency count needs."""
    d = _t(spark, sf_dir, "documents")
    ws = words_col(F.col("text"))
    n = F.size(ws)
    pairs = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.filter(n > 1)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )
