"""Nineteenth extension batch (round 6, part 4): migration-validation
checksums, bitmap-exact distinct counting, volatility bands, URL
canonicalization dedup, and graph link prediction.

- `ext_table_checksum`: order-insensitive per-group table fingerprint
  (sum of 60-bit md5 row digests) — the cross-engine migration
  validator: two systems holding the same rows produce the same
  checksum regardless of row order or partitioning. 60-bit digests
  (15 hex chars) keep every engine in exact integer range; the sum
  accumulates in DECIMAL(38,0)/HUGEINT and folds mod 2^62 to a
  BIGINT so the published value is representation-proof (r9 re-spec
  after the r8 driver red on the >2^64 DECIMAL output).
- `ext_bitmap_distinct`: EXACT distinct counting via Spark's bitmap
  aggregate family (bitmap_bucket_number / bitmap_bit_position /
  bitmap_construct_agg / bitmap_count / bitmap_or_agg) — the
  mergeable warehouse-standard alternative to count(DISTINCT): the
  per-(group, bucket) bitmaps are partial aggregates that OR-merge
  across groups, so the global distinct is a second-level rollup of
  the SAME state, not a second scan.
- `ext_bollinger_bands`: rolling 24-observation mean +/- 2 sigma
  volatility bands with breach flags over the hourly purchase series
  — the rolling-second-moment operator (z-band anomaly screens).
  Rolling sums/sum-of-squares are exact integer window aggregates;
  each band value is one fixed IEEE tree over those integers.
- `llm_url_canonicalize`: URL canonicalization dedup (lowercase,
  strip default port / www / fragment / tracking params / trailing
  slash) — the first normalization pass of every web-crawl pipeline;
  groups raw crawl URLs into canonical keys with variant counts.
- `graph_common_neighbors`: common-neighbor / Jaccard link prediction
  on the customer co-purchase graph — scores NON-edges by shared
  neighborhood via the same bounded wedge join as
  graph_triangle_count (intermediate ~ sum(deg^2), never |V|^2).

Determinism contract: checksums/counts/bitmaps are exact integers;
Bollinger and Jaccard doubles are single fixed IEEE trees over exact
integers (no float accumulation); every LIMIT carries a total
tiebreak. Reference analog: none (beyond the reference surface)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.ckpt import checkpoint_rotate, retire_ids
from .registry import _t, register
from .registry_ext9 import _COPURCHASE_EDGES_SQL, _copurchase_edges

# Canonical row serialization for checksumming: every column cast to a
# format both engines print identically (integers, strings, epoch
# micros, half-up cents).
_ROW_CANON_SQL = (
    "concat_ws('|', CAST(event_id AS STRING), CAST(user_id AS STRING), "
    "event_type, CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS STRING), "
    "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS STRING))"
)
_ROW_CANON_DUCK = (
    "concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR), "
    "event_type, CAST(epoch_us(ts) AS VARCHAR), "
    "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR))"
)


@register(
    "ext_table_checksum",
    f"""
    WITH h AS (
      SELECT event_type,
             CAST(CAST('0x' || substr(md5({_ROW_CANON_DUCK}), 1, 15)
                  AS BIGINT) AS HUGEINT) AS d
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(d) % CAST(4611686018427387904 AS HUGEINT) AS BIGINT)
             AS checksum
    FROM h GROUP BY event_type
    """,
)
def ext_table_checksum(spark, sf_dir):
    """Order-insensitive per-partition table checksum — the migration
    /replication validator: serialize each row canonically (integers,
    epoch micros, half-up cents — formats both engines print
    identically), md5 it, keep 60 bits (15 hex chars, exact in any
    engine's signed 64), and SUM per group. Addition is commutative,
    so the checksum is independent of row order, partitioning, and
    engine — equal data yields equal checksums, and a single changed
    row changes the sum with probability 1 - 2^-60. The sum
    accumulates in DECIMAL(38,0) (DuckDB: HUGEINT recast) since 2^60
    x rows passes BIGINT immediately, then FOLDS to int64 range
    (mod 2^62, emitted BIGINT) so the published checksum is
    representation-proof: every engine, driver, and hash
    canonicalizer round-trips a sub-2^62 integer exactly, whereas a
    ~2^70 DECIMAL(38,0) silently diverges in any float64 or
    HUGEINT-vs-DECIMAL formatting path (r8 driver red, VERDICT.md).
    Folding is checksum-neutral: mod is a homomorphism over the sum,
    and collision probability stays ~2^-62 per changed row. Scale
    shape: one
    partial-aggregable pass, no shuffle beyond the tiny group rollup —
    THE pattern for verifying a 100 TB copy without sorting it.
    Reference analog: the reference's row-count verification
    (project/db.py:430 family) upgraded to content equality."""
    e = _t(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        F.expr(
            f"CAST(conv(substr(md5({_ROW_CANON_SQL}), 1, 15), 16, 10) "
            "AS DECIMAL(38,0))"
        ).alias("d"),
    )
    return h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            "CAST(sum(d) % CAST(4611686018427387904 AS DECIMAL(38,0)) "
            "AS BIGINT)"
        ).alias("checksum"),
    )


@register(
    "ext_bitmap_distinct",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def ext_bitmap_distinct(spark, sf_dir):
    """EXACT distinct-user counts via Spark's bitmap aggregate family
    — the mergeable warehouse pattern that replaces count(DISTINCT)
    at scale: map side builds per-(event_type, bucket) bitmaps
    (bitmap_construct_agg of bitmap_bit_position, buckets of 32768
    ids), counts are sums of per-bucket popcounts, and the GLOBAL
    distinct does NOT rescan the data — it OR-merges (bitmap_or_agg)
    the same per-bucket bitmaps across event types. The oracle is
    plain count(DISTINCT): the bitmap path must reproduce it exactly.
    Scale shape: state is bounded by |id-space|/8 bytes spread across
    buckets (shuffle key = (group, bucket), so no single reducer holds
    a giant sketch) — contrast ext_approx_count_distinct (HLL, approx)
    and ext_hll_sketch_merge: this one is exact AND mergeable.
    Reference analog: project/db.py count-distinct rows (registry row
    21) re-expressed as mergeable state."""
    e = _t(spark, sf_dir, "events").select("event_type", "user_id")
    bm = e.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    per_type = bm.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users")
    )
    merged = (
        bm.groupBy("bucket")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("c"))
        .agg(F.sum("c").cast("long").alias("n_users"))
        .select(F.lit("__all__").alias("event_type"), "n_users")
    )
    return per_type.unionByName(merged)


@register(
    "ext_bollinger_bands",
    """
    WITH hourly AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS t,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    roll AS (
      SELECT t, cents,
             row_number() OVER (ORDER BY t) AS rn,
             sum(CAST(cents AS HUGEINT)) OVER (ORDER BY t
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS s,
             sum(CAST(cents AS HUGEINT) * cents) OVER (ORDER BY t
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS ss
      FROM hourly
    )
    SELECT t, cents,
           CAST(s AS DOUBLE) / 24 + 0 AS mean_cents,
           sqrt(CAST(24 * ss - s * s AS DOUBLE) / 576) + 0 AS sd_cents,
           CAST(CASE
             WHEN cents > CAST(s AS DOUBLE) / 24
                          + 2 * sqrt(CAST(24 * ss - s * s AS DOUBLE) / 576)
               THEN 1
             WHEN cents < CAST(s AS DOUBLE) / 24
                          - 2 * sqrt(CAST(24 * ss - s * s AS DOUBLE) / 576)
               THEN -1
             ELSE 0 END AS BIGINT) AS breach
    FROM roll WHERE rn >= 24
    """,
)
def ext_bollinger_bands(spark, sf_dir):
    """Rolling 24-observation Bollinger bands (mean +/- 2 population
    sigma) with breach flags over the hourly purchase-cents series —
    the rolling-volatility screen (z-band anomaly detection) every
    telemetry stack runs. Exactness: the hourly series is an exact
    BIGINT cents sum; rolling sum and sum-of-squares are WINDOW
    aggregates over exact integers, accumulated in DECIMAL(38,0)
    (DuckDB HUGEINT — cents^2 passes BIGINT at high SF, the
    ml_spearman_corr lesson); mean and sigma are single fixed IEEE
    trees over those integers (population variance via the all-integer
    numerator 24*ss - s^2), so the doubles are bit-identical at any
    partitioning and ship unrounded. Scale shape: one
    partial-aggregable groupBy(hour) collapses the stream; the rolling
    window runs on the calendar-bounded series. Reference analog:
    rolling z-features in project/database_and_model_tools.py:95-130."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hourly = (
        e.select(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            .cast("long")
            .alias("t"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("t")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = Window.orderBy("t").rowsBetween(-23, 0)
    roll = hourly.select(
        "t",
        "cents",
        F.row_number().over(Window.orderBy("t")).alias("rn"),
        F.sum(F.col("cents").cast("decimal(38,0)")).over(w).alias("s"),
        F.sum((F.col("cents").cast("decimal(38,0)") * F.col("cents")))
        .over(w)
        .alias("ss"),
    )
    mean = F.col("s").cast("double") / 24
    sd = F.sqrt((24 * F.col("ss") - F.col("s") * F.col("s")).cast("double") / 576)
    breach = (
        F.when(F.col("cents") > mean + 2 * sd, 1)
        .when(F.col("cents") < mean - 2 * sd, -1)
        .otherwise(0)
        .cast("long")
    )
    return roll.filter(F.col("rn") >= 24).select(
        "t",
        "cents",
        (mean + 0).alias("mean_cents"),
        (sd + 0).alias("sd_cents"),
        breach.alias("breach"),
    )


# --- URL canonicalization dedup ----------------------------------------------

_RAW_URL_DUCK = """
      concat(
        CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END,
        source, '.example-', lang, '.org',
        CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END,
        '/docs/', CAST(doc_id % 50 AS VARCHAR),
        CASE WHEN doc_id % 5 = 4 THEN '/'
             WHEN doc_id % 2 = 0
               THEN concat('?utm_source=feed&ref=', lang, '&id=',
                           CAST(doc_id % 25 AS VARCHAR))
             ELSE concat('?ref=', lang, '&id=', CAST(doc_id % 25 AS VARCHAR))
        END,
        CASE WHEN doc_id % 4 = 1 THEN '#frag' ELSE '' END)
"""


@register(
    "llm_url_canonicalize",
    f"""
    WITH raw AS (SELECT doc_id, {_RAW_URL_DUCK} AS url FROM documents),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   replace(replace(lower(url), ':443/', '/'),
                           'https://www.', 'https://'),
                   '#.*$', ''),
                 '[?].*&id=', '?id='),
               '/$', '') AS curl
      FROM raw
    )
    SELECT curl, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon GROUP BY curl
    """,
)
def llm_url_canonicalize(spark, sf_dir):
    """URL canonicalization dedup — the first normalization pass of a
    web-crawl pipeline: lowercase scheme/host, strip the :443 default
    port, the www. prefix, fragments, tracking params (utm_*/ref,
    keeping the content-bearing id), and trailing slashes, then group
    raw crawl URLs by canonical key (n_docs, raw-variant count,
    keep-first doc). Raw URLs are minted deterministically from
    document attributes with injected mess (mixed case, ports,
    fragments, tracking params — the llm_url_domain_stats minting
    doctrine, testdata has no URL column). The normalization chain is
    plain lower/replace plus three backreference-FREE regexes (Java
    and RE2 agree on these), applied identically in both engines.
    Scale shape: narrow per-row projection then one partial-aggregable
    groupBy; the canonical key space is construction-bounded, and in a
    real crawl this groupBy IS the dedup shuffle — keyed on the
    canonical url, never on page content. Reference analog: none."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(
            F.lit("https://")
        ),
        F.col("source"),
        F.lit(".example-"),
        F.col("lang"),
        F.lit(".org"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 5 == 4, F.lit("/"))
        .when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed&ref="),
                F.col("lang"),
                F.lit("&id="),
                (F.col("doc_id") % 25).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("?ref="),
                F.col("lang"),
                F.lit("&id="),
                (F.col("doc_id") % 25).cast("string"),
            )
        ),
        F.when(F.col("doc_id") % 4 == 1, F.lit("#frag")).otherwise(F.lit("")),
    )
    raw = d.select("doc_id", url.alias("url"))
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.replace(
                    F.replace(F.lower(F.col("url")), F.lit(":443/"), F.lit("/")),
                    F.lit("https://www."),
                    F.lit("https://"),
                ),
                "#.*$",
                "",
            ),
            "[?].*&id=",
            "?id=",
        ),
        "/$",
        "",
    )
    canon = raw.select("doc_id", "url", curl.alias("curl"))
    return canon.groupBy("curl").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("url").cast("long").alias("n_raw_variants"),
        F.min("doc_id").cast("long").alias("keeper_doc_id"),
    )


# --- link prediction: common neighbors / Jaccard -----------------------------


@register(
    "graph_common_neighbors",
    f"""
    WITH {_COPURCHASE_EDGES_SQL},
    adj AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    wedge AS (
      SELECT a.u AS u, b.v AS w, CAST(count(*) AS BIGINT) AS cn
      FROM adj a JOIN adj b ON a.v = b.u AND a.u < b.v
      GROUP BY a.u, b.v
    ),
    cand AS (
      SELECT wg.u, wg.w, wg.cn FROM wedge wg
      LEFT JOIN edges e ON e.u = wg.u AND e.v = wg.w
      WHERE e.u IS NULL
    )
    SELECT c.u, c.w, c.cn,
           CAST(c.cn AS DOUBLE) / (du.d + dw.d - c.cn) + 0 AS jaccard
    FROM cand c JOIN deg du ON du.u = c.u JOIN deg dw ON dw.u = c.w
    ORDER BY jaccard DESC, c.cn DESC, c.u, c.w
    LIMIT 20
    """,
)
def graph_common_neighbors(spark, sf_dir):
    """Common-neighbor / Jaccard link prediction on the customer
    co-purchase graph: score NON-adjacent pairs by shared
    neighborhood, Jaccard = cn / (deg(u) + deg(w) - cn) — the
    classical similarity-based recommender (suggest customers with
    overlapping baskets who never co-bought). Candidate pairs come
    from the SAME bounded wedge join as graph_triangle_count (adj
    self-join on the middle vertex, intermediate ~ sum(deg^2) on the
    sparse-by-construction graph — never |V|^2); an anti-join against
    the edge set removes existing links; degrees ride a broadcastable
    per-node rollup. Determinism: cn and degrees are exact integers;
    Jaccard is ONE integer division (identical double both engines);
    the top-20 carries the total tiebreak (jaccard, cn, u, w).
    Scale note: graph entries differential-prove at the 3x replica
    (the 10x replica's densification is unrealistic for this graph —
    see SCALE.md). Reference analog: none."""
    # checkpoint the edge build once: the scoring plan references it
    # SEVEN times (deg + both wedge sides through adj, plus the
    # anti-join) and would re-run the pair-generation build per branch;
    # the bounded top-20 is collected eagerly so the checkpoint's
    # blocks retire before return (operators/ckpt.py)
    edges, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir))
    adj = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a, b = adj.alias("a"), adj.alias("b")
    wedge = (
        a.join(b, (F.col("a.v") == F.col("b.u")) & (F.col("a.u") < F.col("b.v")))
        .groupBy(F.col("a.u").alias("u"), F.col("b.v").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    e = edges.alias("e")
    cand = wedge.alias("wg").join(
        e,
        (F.col("e.u") == F.col("wg.u")) & (F.col("e.v") == F.col("wg.w")),
        "left_anti",
    )
    du, dw = deg.alias("du"), deg.alias("dw")
    scored = (
        cand.alias("c")
        .join(du, F.col("du.u") == F.col("c.u"))
        .join(dw, F.col("dw.u") == F.col("c.w"))
        .select(
            F.col("c.u").alias("u"),
            F.col("c.w").alias("w"),
            F.col("c.cn").alias("cn"),
            (
                F.col("c.cn").cast("double")
                / (F.col("du.d") + F.col("dw.d") - F.col("c.cn"))
                + 0
            ).alias("jaccard"),
        )
    )
    out = scored.orderBy(
        F.col("jaccard").desc(), F.col("cn").desc(), "u", "w"
    ).limit(20)
    rows = out.collect()  # <=20 rows by construction
    retire_ids(spark, e_ids)
    # re-apply the ordering explicitly: parallelize happens to keep
    # local-list order today, but ordered output should not ride on
    # that (graph_k_core sets the same pattern)
    return spark.createDataFrame(rows, out.schema).orderBy(
        F.col("jaccard").desc(), F.col("cn").desc(), "u", "w"
    )
