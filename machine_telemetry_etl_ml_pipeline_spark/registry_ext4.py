"""Fourth extension batch: surrogate keys (SERIAL parity), distinct
subsets, union-by-name with missing columns, ordered string
aggregation, sampling, KMeans anomaly scoring, and streaming
static-join / stateful-dedup queries.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from .registry import _t, register

# --- SERIAL / surrogate keys (SURVEY §1.2 type-mapping row 1) ---------------


@register(
    "ref_surrogate_ids",
    """
    SELECT row_number() OVER (ORDER BY ts, event_id) AS sid, event_id
    FROM events QUALIFY sid <= 100
    """,
)
def ref_surrogate_ids(spark, sf_dir):
    """SERIAL-column parity (reference id SERIAL PRIMARY KEY,
    db.py:82): Spark has no auto-increment; stable surrogate keys are
    a row_number over an explicit total order (SURVEY §1.2).
    monotonically_increasing_id() is the shuffle-free alternative when
    stability across runs is not required."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.select(F.row_number().over(w).alias("sid"), "event_id")
        .filter(F.col("sid") <= 100)
    )


@register(
    "ext_distinct_subset",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def ext_distinct_subset(spark, sf_dir):
    """dropDuplicates on a column subset (exact-dedup idiom)."""
    e = _t(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates()


@register(
    "ext_union_missing_cols",
    """
    SELECT event_id, value, NULL AS o_totalprice FROM events WHERE value > 195
    UNION ALL
    SELECT o_orderkey AS event_id, NULL AS value, o_totalprice
    FROM orders WHERE o_totalprice > 450000
    """,
)
def ext_union_missing_cols(spark, sf_dir):
    """unionByName(allowMissingColumns=True): schema-evolving union —
    absent columns NULL-pad instead of erroring."""
    e = _t(spark, sf_dir, "events").filter(F.col("value") > 195).select("event_id", "value")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_orderkey").alias("event_id"), "o_totalprice")
    )
    return e.unionByName(o, allowMissingColumns=True)


@register(
    "ext_string_agg",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
           bool_or(event_type = 'error') AS had_error,
           bool_and(value > 0) AS all_positive
    FROM events GROUP BY user_id
    """,
)
def ext_string_agg(spark, sf_dir):
    """Ordered string aggregation + boolean aggregates. collect_set is
    unordered by contract — sort_array makes the result deterministic
    (and oracle-comparable)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types_csv"),
        F.bool_or(F.col("event_type") == "error").alias("had_error"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
    )


@register(
    "ext_corr_covar",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) + 0 AS covar_qty_price,
           round(covar_pop(l_discount, l_tax), 4) + 0 AS covar_disc_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_corr_covar(spark, sf_dir):
    """Bivariate statistical aggregates (corr / covar): single-pass,
    partial-aggregable moment sketches in both engines. The `+ 0`
    normalizes IEEE negative zero (round of a tiny negative covariance
    yields -0.0 in one engine and 0.0 in the other)."""
    li = _t(spark, sf_dir, "lineitem")
    zero = F.lit(0.0)
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + zero).alias("corr_qty_price"),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + zero).alias("covar_qty_price"),
        (F.round(F.covar_pop("l_discount", "l_tax"), 4) + zero).alias("covar_disc_tax"),
    )


_SAMPLE_FRACTION = 0.1
_SAMPLE_SPACE = 16**7  # md5_bucket(_, 7) range
_SAMPLE_THR = int(_SAMPLE_FRACTION * _SAMPLE_SPACE)


def _sample_bucket_sql() -> str:
    from .llm.prep import hex_bucket_sql

    return hex_bucket_sql("md5(CAST(event_id AS VARCHAR))", 7)


@register(
    "ext_sample",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE {_sample_bucket_sql()} < {_SAMPLE_THR}
    """,
)
def ext_sample(spark, sf_dir):
    """Bernoulli sampling at 10% — re-specced (r7 verdict item 5) from
    Spark's seeded sample() (engine-specific RNG, rows-only forever)
    to a HASH-threshold Bernoulli: keep iff md5_bucket(event_id, 7) <
    0.1 * 16^7. Same statistical contract (each row kept independently
    w.p. ~0.1), but the draw is a pure function of the key, so the
    sample is exactly reproducible across runs, engines, partitions,
    and cluster sizes — which is also the property a 100 TB pipeline
    wants (a resumed/re-run job re-selects the identical sample; no
    seed-per-partition coupling). The oracle runs the identical
    hex-digit arithmetic, upgrading the entry from rows-only to
    exact."""
    from .llm.prep import md5_bucket

    e = _t(spark, sf_dir, "events")
    s = e.filter(md5_bucket(F.col("event_id"), 7) < F.lit(_SAMPLE_THR))
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "ml_kmeans_anomaly",
    """
    SELECT count(*) AS total_rows,
           CAST(floor(count(*) * 0.05) AS BIGINT) AS flagged_rows,
           true AS separation_ok
    FROM events
    """,
)
def ml_kmeans_anomaly(spark, sf_dir):
    """M4 anomaly surface: KMeans distance-to-centroid scores over
    event features (seeded, deterministic within Spark). Round-2
    upgrade per VERDICT item 4: instead of a rows-only score dump, flag
    exactly the top floor(5% * n) scores (distributed sort-limit top-k
    with a unique event_id tiebreak) and emit oracle-checkable
    invariants — total rows, flagged rows (= floor(0.05*n) by
    construction), and the separation property min(flagged score) >=
    max(unflagged score), computed honestly via a broadcast anti-join.
    The iterative KMeans fit itself is not SQL-expressible; these
    aggregates are the differential check that the distributed scoring
    + top-k pipeline ran correctly end to end.

    Scale note: exact top-(5% of n) via sort-limit is the RIGHT shape
    for the differential check (deterministic count) but k grows with
    n, and TakeOrderedAndProject merges k rows per partition at the
    driver — at 100 TB the production path is
    ml.pipeline.anomaly_scores: an approxQuantile(0.95) threshold
    (mergeable sketch, one pass) with flag rate ~=5%, trading the
    exact count for full distribution."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml import Pipeline
    from pyspark.ml.functions import vector_to_array

    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("f_value"),
        F.hour("ts").cast("double").alias("f_hour"),
        (F.col("user_id") % 10).cast("double").alias("f_usermod"),
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=["f_value", "f_hour", "f_usermod"], outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features", withMean=True, withStd=True),
            KMeans(featuresCol="features", predictionCol="cluster", k=4, seed=42),
        ]
    )
    model = pipe.fit(e)
    km = model.stages[-1]
    arr = vector_to_array("features")
    dists = [
        F.sqrt(
            F.aggregate(
                F.zip_with(arr, F.array(*[F.lit(x) for x in c.tolist()]), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        for c in km.clusterCenters()
    ]
    scored = model.transform(e).withColumn("score", F.least(*dists)).select("event_id", "score")
    n = scored.count()
    k = int(n * 5 // 100)
    # Distributed exact top-k (TakeOrderedAndProject): unique event_id
    # tiebreak makes the flagged set deterministic even on tied scores.
    flagged = scored.orderBy(F.desc("score"), F.asc("event_id")).limit(k)
    flagged_keys = flagged.select("event_id")
    unflagged = scored.join(F.broadcast(flagged_keys), "event_id", "left_anti")
    f_stats = flagged.agg(
        F.count(F.lit(1)).alias("flagged_rows"), F.min("score").alias("min_flagged")
    )
    u_stats = unflagged.agg(F.max("score").alias("max_unflagged"))
    return f_stats.crossJoin(u_stats).select(
        F.lit(n).cast("long").alias("total_rows"),
        F.col("flagged_rows"),
        (F.col("min_flagged") >= F.col("max_unflagged")).alias("separation_ok"),
    )


@register(
    "ext_posexplode",
    """
    SELECT doc_id, CAST(pos AS INT) AS pos, word FROM (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word,
             generate_subscripts(list_filter(string_split(text, ' '), x -> x <> ''), 1) AS pos
      FROM documents WHERE doc_id < 10
    )
    """,
)
def ext_posexplode(spark, sf_dir):
    """Positional explode (ordinality): token positions survive the
    flatten — needed whenever order matters downstream (n-gram windows,
    span labeling). 1-based to match SQL generate_subscripts."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    words = F.filter(F.split("text", " "), lambda x: x != "")
    return d.select("doc_id", F.posexplode(words).alias("pos", "word")).select(
        "doc_id", (F.col("pos") + 1).cast("int").alias("pos"), "word"
    )


@register(
    "ext_month_boundaries",
    """
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE)) AS is_month_end
    FROM orders
    """,
)
def ext_month_boundaries(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        (d == F.last_day(d)).alias("is_month_end"),
    )


@register(
    "ext_in_subquery",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def ext_in_subquery(spark, sf_dir):
    """IN-subquery predicate (planned as a left-semi join)."""
    from .sources.catalog import load_table

    for n in ("orders", "customer"):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        """
    )


@register(
    "llm_simhash_hamming_pairs",
    """
    WITH
      sh AS (
        SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
          FROM documents WHERE doc_id < 100
        )
      ),
      sums AS (SELECT doc_id, """
    + ", ".join(
        f"sum(strpos('0123456789abcdef', substr(md5(shingle), {p}, 1)) - 8.5) AS s{p}"
        for p in range(1, 17)
    )
    + """ FROM sh GROUP BY doc_id),
      sh16 AS (SELECT doc_id, CAST("""
    + " + ".join(f"(CASE WHEN s{p} > 0 THEN {1 << (p - 1)} ELSE 0 END)" for p in range(1, 17))
    + """ AS BIGINT) AS simhash FROM sums)
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh16 a JOIN sh16 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def llm_simhash_hamming_pairs(spark, sf_dir):
    """SimHash near-dup detection: pairs within Hamming distance 3 on
    the 16-bit signature (100-doc slice). At scale the pair join is
    banded (join on signature bytes) rather than all-pairs; the
    all-pairs form here keeps the oracle simple while the banding
    strategy is what llm_lsh_candidate_pairs demonstrates."""
    from .llm.dedup import char_shingles, simhash16

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    s = simhash16(char_shingles(d))
    a = s.alias("a")
    b = s.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= 3)
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            ham.cast("int").alias("hamming"),
        )
    )


# --- streaming: static join + stateful dedup (oracle-checked) ---------------


def _event_stream(spark, sf_dir):
    from .streaming.windows import events_testdata_stream

    return events_testdata_stream(spark, sf_dir)


def _drain(df, prefix: str):
    import uuid

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


@register(
    "stream_stateful_user_stats",
    """
    SELECT user_id, count(*) AS n,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS sum_value,
           max(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals held in explicit GroupState. The testdata arrives
    as one micro-batch, so the drained update-mode output equals the
    batch aggregate — which is the oracle (exact integer-cents sums
    make the comparison bit-stable)."""
    from .session import tune_session
    from .streaming.stateful import running_user_stats

    tune_session(spark)
    stream = _event_stream(spark, sf_dir)
    out = running_user_stats(stream.select("user_id", "value"))
    import uuid

    name = f"stream_stateful_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "stream_sliding_counts",
    """
    SELECT CAST(floor(epoch(ws)) AS BIGINT) AS window_start,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM (
      SELECT value,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      FROM events
    )
    GROUP BY ws
    """,
)
def stream_sliding_counts(spark, sf_dir):
    """Structured Streaming sliding window (1h / 30m slide) through an
    availableNow memory sink; oracle = the batch bucket-enumeration SQL
    (each event contributes to exactly 2 overlapping windows)."""
    from .session import tune_session

    tune_session(spark)
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "n",
            "sum_value",
        )
    )
    import uuid

    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_TYPE_CODE_SQL = (
    "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 WHEN 'purchase' THEN 2 "
    "WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END"
)


@register(
    "stream_static_join",
    f"""
    SELECT event_id, user_id, event_type, {_TYPE_CODE_SQL} AS type_code
    FROM events
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream-static broadcast join (dimension enrichment on a live
    stream); oracle is the equivalent batch mapping — every streamed
    row must arrive exactly once with its joined attribute."""
    from .session import tune_session

    tune_session(spark)
    stream = _event_stream(spark, sf_dir)
    dim = spark.createDataFrame(
        [("click", 0), ("error", 1), ("purchase", 2), ("signup", 3), ("view", 4)],
        "event_type string, type_code int",
    )
    joined = stream.join(F.broadcast(dim), "event_type").select(
        "event_id", "user_id", "event_type", "type_code"
    )
    return _drain(joined, "stream_ssjoin")


@register(
    "stream_dedup_within_watermark",
    "SELECT event_id, user_id, value FROM events",
)
def stream_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark on event_id: over an
    exactly-unique source the output equals the input relation
    (oracle), and state stays bounded by the watermark horizon —
    the property a replayed/at-least-once source needs."""
    from .session import tune_session

    tune_session(spark)
    stream = _event_stream(spark, sf_dir)
    dedup = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "value")
    )
    return _drain(dedup, "stream_dedup")
