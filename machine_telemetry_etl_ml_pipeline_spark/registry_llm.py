"""LLM-data-pipeline query surface (north-star extension — SURVEY §2B
last rows): dedup (exact / MinHash-LSH / Jaccard / SimHash), vector
similarity search, text analysis, multimodal plumbing — over the
`documents` and `embeddings` testdata tables.

Oracle-parity design: all hashing is md5-lexicographic (portable string
ops — see llm/dedup.py), vector math is float64 with a left-to-right
fold, and every ranking has a deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .llm import multimodal as mm
from .llm import textstats as ts
from .llm.dedup import (
    char_shingles,
    exact_dedup_keep_first,
    jaccard_pairs,
    lsh_candidate_pairs,
    lsh_star_edges,
    minhash_from_docs,
    minhash_signatures,
    simhash16,
    with_fingerprint,
    word_ngrams,
)
from .llm.similarity import (
    brute_force_topk,
    lsh_bucket_counts,
    lsh_topk,
    multiprobe_lsh_topk,
    random_hyperplanes,
)
from .registry import _t, register

# Shared oracle CTE: distinct 5-char shingles per document.
SHINGLES_SQL = """
  sh AS (
    SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
      FROM documents
    )
  )
"""

# Distinct word-3-gram shingles for docs with doc_id < 40.
WORD3_SQL = """
  w3 AS (
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
  )
"""

MINHASH_SQL = """
  mh AS (
    SELECT doc_id,
           min(substr(md5(shingle), 1, 8))  AS mh1, min(substr(md5(shingle), 9, 8))  AS mh2,
           min(substr(md5(shingle), 17, 8)) AS mh3, min(substr(md5(shingle), 25, 8)) AS mh4
    FROM sh GROUP BY doc_id
  )
"""


@register(
    "llm_dedup_exact_stats",
    """
    SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
           count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))) AS n_unique_norm
    FROM documents
    """,
)
def llm_dedup_exact_stats(spark, sf_dir):
    """Exact + normalized dedup cardinality: shuffle 128-bit
    fingerprints, never full text (the 100 TB-relevant property)."""
    d = _t(spark, sf_dir, "documents")
    fp = with_fingerprint(d)
    return fp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.countDistinct("fp_norm").alias("n_unique_norm"),
    )


@register(
    "llm_dedup_keep_first",
    "SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
)
def llm_dedup_keep_first(spark, sf_dir):
    """Exact dedup, keep smallest doc_id per content fingerprint."""
    return exact_dedup_keep_first(_t(spark, sf_dir, "documents"))


@register(
    "llm_minhash_signatures",
    f"WITH {SHINGLES_SQL}, {MINHASH_SQL} SELECT doc_id, mh1, mh2, mh3, mh4 FROM mh",
)
def llm_minhash_signatures(spark, sf_dir):
    """4-component MinHash signature per doc over 5-char shingles.
    min over 8-hex-char slices of md5(shingle) is a valid MinHash
    permutation and computes identically in any engine (llm/dedup.py
    module docstring)."""
    d = _t(spark, sf_dir, "documents")
    return minhash_from_docs(d)


@register(
    "llm_lsh_candidate_pairs",
    f"""
    WITH {SHINGLES_SQL}, {MINHASH_SQL},
    banded AS (
      SELECT doc_id, md5(mh1 || '|' || mh2) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, md5(mh3 || '|' || mh4) AS band_key FROM mh
    )
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM banded l JOIN banded r ON l.band_key = r.band_key AND l.doc_id < r.doc_id
    """,
)
def llm_lsh_candidate_pairs(spark, sf_dir):
    """MinHash LSH banding (2 bands x 2 rows): candidate pairs from
    band-key equi-joins — candidate generation proportional to true
    collisions, not n^2."""
    d = _t(spark, sf_dir, "documents")
    return lsh_candidate_pairs(minhash_from_docs(d))


@register(
    "llm_ngram_jaccard",
    f"""
    WITH {WORD3_SQL},
    sizes AS (SELECT doc_id, count(*) AS sz FROM w3 GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_inter
      FROM w3 a JOIN w3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(n_inter / (sa.sz + sb.sz - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    """,
)
def llm_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard for all overlapping pairs in a 40-doc
    slice — the verification stage that LSH candidates feed at scale."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sh = word_ngrams(d)
    pairs = (
        sh.alias("l")
        .join(sh.alias("r"), (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    return jaccard_pairs(sh, pairs)


_SIMHASH_SUMS = ", ".join(
    f"sum(strpos('0123456789abcdef', substr(md5(shingle), {p}, 1)) - 8.5) AS s{p}"
    for p in range(1, 17)
)
_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN s{p} > 0 THEN {1 << (p - 1)} ELSE 0 END)" for p in range(1, 17)
)


@register(
    "llm_simhash",
    f"""
    WITH {SHINGLES_SQL},
    sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM sh GROUP BY doc_id)
    SELECT doc_id, CAST({_SIMHASH_BITS} AS BIGINT) AS simhash FROM sums
    """,
)
def llm_simhash(spark, sf_dir):
    """16-bit SimHash over the shingle set (hex-digit dimensions —
    llm/dedup.simhash16 docstring)."""
    d = _t(spark, sf_dir, "documents")
    return simhash16(char_shingles(d))


@register(
    "llm_dedup_components",
    f"""
    WITH {SHINGLES_SQL}, {MINHASH_SQL},
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
    )
    SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    """,
)
def llm_dedup_components(spark, sf_dir):
    """Dedup cluster formation: connected components over the MinHash-
    LSH candidate graph (transitive closure of near-dup pairs) via
    iterative min-label propagation — the Spark-native form of an
    operator the DataFrame API lacks (llm/cluster.py). Oracle: a
    recursive-CTE transitive closure computing the same min-reachable
    label."""
    from .llm.cluster import connected_components

    d = _t(spark, sf_dir, "documents")
    # Bucket-star edges, not all-pairs: identical transitive closure,
    # linear (not quadratic) in hot-bucket occupancy — see
    # llm/dedup.lsh_star_edges.
    edges = lsh_star_edges(minhash_from_docs(d))
    return connected_components(d.select("doc_id"), edges)


# --- similarity search -----------------------------------------------------

_COSINE_BASE_SQL = """
  base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5)
"""


@register(
    "llm_cosine_topk",
    f"""
    WITH {_COSINE_BASE_SQL},
    scored AS (
      SELECT query_id, b.vec_id AS neighbor_id,
             round(list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))),
                   4) AS cosine_sim
      FROM q, base b WHERE b.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def llm_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-3 for 5 query vectors — the exact ANN
    baseline. Query side broadcast; corpus scanned once."""
    e = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(e, [0, 1, 2, 3, 4], k=3)


@register(
    "llm_ann_bucket_counts",
    """
    SELECT bucket, count(*) AS n, min(vec_id) AS min_vec_id FROM (
      SELECT vec_id,
             CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN embedding[9] > 0 THEN 2 ELSE 0 END)
                + (CASE WHEN embedding[17] > 0 THEN 4 ELSE 0 END)
                + (CASE WHEN embedding[25] > 0 THEN 8 ELSE 0 END) AS INTEGER) AS bucket
      FROM embeddings
    ) GROUP BY bucket
    """,
)
def llm_ann_bucket_counts(spark, sf_dir):
    """Sign-LSH bucket occupancy (4 coordinate hyperplanes -> 16
    buckets): the ANN scale path's candidate-set diagnostic."""
    return lsh_bucket_counts(_t(spark, sf_dir, "embeddings"))


@register(
    "llm_ann_lsh_topk",
    f"""
    WITH
    bb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN embedding[9] > 0 THEN 2 ELSE 0 END)
                + (CASE WHEN embedding[17] > 0 THEN 4 ELSE 0 END)
                + (CASE WHEN embedding[25] > 0 THEN 8 ELSE 0 END) AS INTEGER) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bb WHERE vec_id < 5),
    scored AS (
      SELECT query_id, b.vec_id AS neighbor_id,
             round(list_dot_product(qv, b.v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(b.v, b.v))),
                   4) AS cosine_sim
      FROM q JOIN bb b ON q.bucket = b.bucket AND b.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def llm_ann_lsh_topk(spark, sf_dir):
    """Approximate top-3: only same-bucket candidates are scored — at
    100 TB this is the difference between scoring ~1/16th of the corpus
    and all of it (recall traded via bucket count)."""
    return lsh_topk(_t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=3)


# Seeded random hyperplanes shared verbatim (rounded-literal for
# identical doubles) between the Spark plan and the DuckDB oracle.
_ANN_PLANES = random_hyperplanes(dim=64, n_planes=6, n_tables=2, seed=7)


def _bucket_sql(planes_for_table):
    terms = []
    for j, p in enumerate(planes_for_table):
        lits = ", ".join(repr(x) for x in p)
        terms.append(
            f"(CASE WHEN list_dot_product(v, CAST([{lits}] AS DOUBLE[])) > 0"
            f" THEN {2**j} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


@register(
    "llm_ann_multiprobe_topk",
    f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    tagged AS (
      SELECT vec_id, v, 0 AS tbl, {_bucket_sql(_ANN_PLANES[0])} AS bucket FROM base
      UNION ALL
      SELECT vec_id, v, 1 AS tbl, {_bucket_sql(_ANN_PLANES[1])} AS bucket FROM base
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, tbl, bucket FROM tagged WHERE vec_id < 5),
    qp AS (SELECT query_id, qv, tbl, xor(bucket, off) AS bucket
           FROM q, (VALUES (0), (1), (2)) p(off)),
    scored AS (
      SELECT query_id, b.vec_id AS neighbor_id,
             round(list_dot_product(qv, b.v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(b.v, b.v))),
                   4) AS cosine_sim
      FROM qp JOIN tagged b
        ON qp.tbl = b.tbl AND qp.bucket = b.bucket AND b.vec_id <> qp.query_id
    ),
    dedup AS (SELECT query_id, neighbor_id, max(cosine_sim) AS cosine_sim
              FROM scored GROUP BY 1, 2)
    SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
      FROM dedup
    ) WHERE rnk <= 3
    """,
)
def llm_ann_multiprobe_topk(spark, sf_dir):
    """ANN top-3 with tunable recall (VERDICT item 5): 2 independent
    6-plane random-hyperplane tables (seeded Gaussian, band-OR) plus
    Hamming-1 multi-probe on the first 2 sign bits. Candidates come
    from a (table, bucket) equi-join against the broadcast query side;
    multi-table/probe duplicates collapse via partial-aggregable
    groupBy max. Recall vs brute force is test-asserted
    (tests/test_llm_ops.py)."""
    return multiprobe_lsh_topk(
        _t(spark, sf_dir, "embeddings"),
        [0, 1, 2, 3, 4],
        k=3,
        planes=_ANN_PLANES,
        probe_bits=2,
    )


# --- text analysis -----------------------------------------------------------

_HITS_SQL = {
    lang: (
        "len(list_intersect(list_filter(string_split(text, ' '), x -> x <> ''), "
        + "[" + ", ".join(f"'{w}'" for w in ts.STOPWORDS[lang]) + "]))"
    )
    for lang in ts.LANG_ORDER
}
_BEST_SQL = "greatest(" + ", ".join(f"hits_{l}" for l in ts.LANG_ORDER) + ")"
_PRED_SQL = (
    "CASE WHEN " + _BEST_SQL + " <= 0 THEN 'unknown' "
    + " ".join(f"WHEN hits_{l} = {_BEST_SQL} THEN '{l}'" for l in ts.LANG_ORDER)
    + " END"
)


@register(
    "llm_language_id",
    f"""
    SELECT doc_id, lang, hits_en, hits_de, hits_fr, hits_es, hits_zh,
           {_PRED_SQL} AS pred_lang
    FROM (
      SELECT doc_id, lang,
             {", ".join(f"CAST({_HITS_SQL[l]} AS INT) AS hits_{l}" for l in ts.LANG_ORDER)}
      FROM documents
    )
    """,
)
def llm_language_id(spark, sf_dir):
    """Stopword-hit language-ID heuristic with a fixed argmax tie
    order; `lang` (the labeled truth) rides along for accuracy eval."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return ts.with_language_id(d).drop("text")


@register(
    "llm_token_counts",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT)
             AS n_tokens_ws,
           CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS INT) AS n_tokens_alnum
    FROM documents
    """,
)
def llm_token_counts(spark, sf_dir):
    """Whitespace + alnum-run tokenization counts."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return ts.with_token_counts(d).drop("text")


@register(
    "llm_quality_score",
    f"""
    SELECT doc_id, n_chars_calc, n_tokens, n_punct,
           round(mean_word_len, 4) AS mean_word_len,
           round((CASE WHEN n_tokens >= 20 THEN 0.4::DOUBLE ELSE 0.0 END)
               + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.3::DOUBLE ELSE 0.0 END)
               + (CASE WHEN n_punct / n_chars_calc <= 0.1 THEN 0.2::DOUBLE ELSE 0.0 END)
               + (CASE WHEN n_stop > 0 THEN 0.1::DOUBLE ELSE 0.0 END), 4) AS quality_score
    FROM (
      SELECT doc_id,
             length(text) AS n_chars_calc,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             length(replace(text, ' ', ''))
               / len(list_filter(string_split(text, ' '), x -> x <> '')) AS mean_word_len,
             {_HITS_SQL["en"]} AS n_stop
      FROM documents
    )
    """,
)
def llm_quality_score(spark, sf_dir):
    """Length/punctuation/stopword quality features + composite score
    (the classic pre-training quality-filter shape)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return ts.with_quality_score(d).drop("text")


@register(
    "llm_fingerprint",
    """
    SELECT doc_id, md5(text) AS fp,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                    ' +', ' ', 'g'))) AS fp_norm
    FROM documents
    """,
)
def llm_fingerprint(spark, sf_dir):
    """Content + normalized-content fingerprints (dedup join keys)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_fingerprint(d).drop("text")


# --- multimodal --------------------------------------------------------------


@register(
    "llm_multimodal_pack",
    """
    SELECT doc_id AS asset_id, 'text' AS media_type,
           CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(length(text) AS VARCHAR) AS meta_orig_len
    FROM documents
    """,
)
def llm_multimodal_pack(spark, sf_dir):
    """Multimodal packing: text payload -> opaque binary `content` +
    typed metadata map (schemas.MULTIMODAL_ASSET convention). The
    oracle checks byte length + content digest of the binary."""
    d = _t(spark, sf_dir, "documents")
    assets = mm.pack_assets(d, "doc_id", "text", F.lit("text"))
    return assets.select(
        "asset_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.element_at("meta", "orig_len").alias("meta_orig_len"),
    )


@register(
    "llm_multimodal_decode",
    """
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           'text' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE unicode(substr(text, 1, 1)) END AS DOUBLE) AS feat_first,
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE unicode(substr(text, length(text), 1)) END AS DOUBLE)
             AS feat_last,
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE mod(list_sum(list_transform(string_split(text, ''),
                                                      c -> unicode(c))), 997)
                END AS DOUBLE) AS feat_checksum
    FROM documents
    """,
)
def llm_multimodal_decode(spark, sf_dir):
    """Arrow-batched mapInPandas decode over packed assets. The codec
    is a deterministic byte-statistic STUB (llm/multimodal.decode_stub
    with fake=True — real image/audio libs absent in this container;
    fake=False is the integration point); the distributed plumbing
    (schema, batching, partition preservation) is real. Upgraded (r7
    verdict item 5) from rows-only to an EXACT oracle: the fake
    feature vector is (n_bytes, first_byte, last_byte, byte_sum mod
    997) over the UTF-8 payload, which DuckDB reproduces with
    per-character unicode() arithmetic — valid because the documents
    corpus is pure ASCII (probed: 0 non-ASCII rows at every SF;
    code point == byte there), so the whole batch path from pack
    through Arrow decode is now value-checked per asset."""
    d = _t(spark, sf_dir, "documents")
    assets = mm.pack_assets(d, "doc_id", "text", F.lit("text"))
    decoded = mm.decode_assets(assets, fake=True)
    return decoded.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 2).alias("feat_first"),
        F.element_at("features", 3).alias("feat_last"),
        F.element_at("features", 4).alias("feat_checksum"),
    )


# --- training-data preparation ops (round 2) --------------------------------


@register(
    "llm_chunk_documents",
    """
    SELECT doc_id, CAST(idx AS INT) AS chunk_idx,
           CAST(len(chunk_words) AS INT) AS n_words,
           array_to_string(chunk_words, ' ') AS chunk_text
    FROM (
      SELECT doc_id, idx,
             list_slice(ws, start, least(start + 19, len(ws))) AS chunk_words
      FROM (
        SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - 5, 1), 15)) AS start,
               unnest(generate_series(1, greatest(len(ws) - 5, 1), 15)) - 1 AS _s0,
               CAST((unnest(generate_series(1, greatest(len(ws) - 5, 1), 15)) - 1) / 15
                    AS BIGINT) AS idx
        FROM (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents
        )
      )
    )
    WHERE len(chunk_words) > 0
    """,
)
def llm_chunk_documents(spark, sf_dir):
    """Document chunking for training-data prep: 20-word chunks with
    5-word overlap (stride 15), expressed as sequence + explode +
    slice — pure codegen, no UDF; chunk boundaries are word-aligned and
    deterministic. At 100 TB this is one Generate over pre-split word
    arrays (rows multiply by ~len/stride, bytes stay ~1x + overlap)."""
    from .llm.prep import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"))


_HEXPOS = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"


@register(
    "llm_train_test_split",
    f"""
    SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM (
      SELECT doc_id,
             CASE WHEN ({_HEXPOS.format(p=1)}) * 16 + ({_HEXPOS.format(p=2)}) < 205
                  THEN 'train' ELSE 'test' END AS split
      FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
    )
    GROUP BY split
    """,
)
def llm_train_test_split(spark, sf_dir):
    """Deterministic hash-based train/test split (~80/20): the split of
    a document is a pure function of its id (md5 first byte < 205/256),
    so it is stable across runs, engines, and cluster sizes — the
    property that matters for reproducible training data. No RNG, no
    shuffle beyond the count aggregation."""
    from .llm.prep import hash_split

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", hash_split(d).alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_doc_id"))
    )


@register(
    "llm_scrub_text",
    r"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(
                 text || ' contact: user' || CAST(doc_id AS VARCHAR)
                      || '@example.com tel 555-0142',
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_fp
    FROM documents
    """,
)
def llm_scrub_text(spark, sf_dir):
    """PII-style scrubbing (email/phone masking) as whole-column
    regexp_replace — JVM-side, no UDF. The input is augmented with a
    synthetic contact line (the corpus has no PII) so the masking path
    is actually exercised; the fingerprint of the scrubbed text is the
    differential check that both regex engines rewrote identically."""
    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-0142"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
        r"[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    )
    return d.select("doc_id", F.md5(scrubbed).alias("scrubbed_fp"))


@register(
    "llm_ann_ivf_recall",
    """
    SELECT CAST(least(5, count(*) - 1) * count(*) FILTER (WHERE vec_id < 10) AS BIGINT)
             AS n_pairs,
           true AS recall_ge_half
    FROM embeddings
    """,
)
def llm_ann_ivf_recall(spark, sf_dir):
    """IVF-style ANN (seeded KMeans coarse quantizer, 8 cells, probe
    3): the driver-checkable output is the recall invariant against the
    exact brute-force top-5 for 10 queries, computed in-query via a
    semi join. KMeans is deterministic under the fixed seed, so the
    invariant is stable; measured recall 0.62 at sf0.01 scoring ~3/8 of
    the corpus per query (llm/similarity.ivf_topk). The oracle derives
    n_pairs from the table (5 per present query id) rather than a
    literal, so the invariant self-adjusts if an SF dir lacks some of
    vec_id 0-9; the recall>=0.5 bound is likewise checked relative to
    the actual pair count. Recall was validated at sf0.001/0.01/0.1 —
    revalidate when a new SF dir joins the sweep."""
    from .llm.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    qids = list(range(10))
    brute = brute_force_topk(e, qids, k=5).select("query_id", "neighbor_id")
    ivf = ivf_topk(e, qids, k=5, n_cells=8, n_probe=3).select("query_id", "neighbor_id")
    hits = brute.join(ivf, ["query_id", "neighbor_id"], "left_semi")
    return brute.agg(F.count(F.lit(1)).alias("n_pairs")).crossJoin(
        hits.agg(F.count(F.lit(1)).alias("n_hits"))
    ).select(
        "n_pairs", (F.col("n_hits") * 2 >= F.col("n_pairs")).alias("recall_ge_half")
    )


@register(
    "llm_pipeline_end_to_end",
    f"""
    WITH kept AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    docs AS (
      SELECT d.doc_id, d.text FROM documents d JOIN kept k ON d.doc_id = k.doc_id
    ),
    chunks AS (
      SELECT doc_id,
             list_slice(ws, start, least(start + 19, len(ws))) AS chunk_words
      FROM (
        SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - 5, 1), 15)) AS start
        FROM (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM docs
        )
      )
    ),
    labeled AS (
      SELECT doc_id, len(chunk_words) AS n_words,
             CASE WHEN (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) < 205
                  THEN 'train' ELSE 'test' END AS split
      FROM (SELECT doc_id, chunk_words, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM chunks WHERE len(chunk_words) > 0)
    )
    SELECT split, count(*) AS n_chunks,
           count(DISTINCT doc_id) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words
    FROM labeled GROUP BY split
    """,
)
def llm_pipeline_end_to_end(spark, sf_dir):
    """The full training-data pipeline composed as ONE lazy plan:
    exact dedup (keep first) -> word-aligned chunking -> deterministic
    hash split -> per-split corpus stats. Catalyst plans the whole
    chain together (dedup's shuffle feeds the narrow chunk/split
    stages; one aggregation at the end) — the composition, not just
    the parts, is what a 100 TB data-prep job runs."""
    from .llm.prep import chunk_documents, hash_split

    d = _t(spark, sf_dir, "documents")
    kept = exact_dedup_keep_first(d).select("doc_id")
    docs = d.join(kept, "doc_id", "left_semi")
    chunks = chunk_documents(docs)
    labeled = chunks.select("doc_id", "n_words", hash_split(chunks).alias("split"))
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_words").alias("sum_words"),
    )


@register(
    "llm_dedup_keep_best",
    f"""
    WITH {SHINGLES_SQL}, {MINHASH_SQL},
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
    q AS (
      SELECT doc_id,
             round((CASE WHEN n_tokens >= 20 THEN 0.4::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.3::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN n_punct / n_chars_calc <= 0.1 THEN 0.2::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN n_stop > 0 THEN 0.1::DOUBLE ELSE 0.0 END), 4) AS quality_score
      FROM (
        SELECT doc_id,
               length(text) AS n_chars_calc,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
               length(replace(text, ' ', ''))
                 / len(list_filter(string_split(text, ' '), x -> x <> '')) AS mean_word_len,
               {_HITS_SQL["en"]} AS n_stop
        FROM documents
      )
    )
    SELECT component, doc_id, quality_score FROM (
      SELECT c.component, c.doc_id, q.quality_score,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn
      FROM comp c JOIN q USING (doc_id)
    ) WHERE rn = 1
    """,
)
def llm_dedup_keep_best(spark, sf_dir):
    """Near-dup dedup with QUALITY-aware representative selection:
    connected components over the LSH star graph choose the cluster,
    the quality score chooses the survivor (row_number per component,
    score desc, doc_id tiebreak) — the production keep-policy, vs the
    min-id convenience policy of dedup_by_component. One extra shuffle
    (join components with scores) + one window."""
    from pyspark.sql import Window

    from .llm.cluster import connected_components

    d = _t(spark, sf_dir, "documents")
    comp = connected_components(
        d.select("doc_id"), lsh_star_edges(minhash_from_docs(d))
    )
    scores = ts.with_quality_score(d.select("doc_id", "text")).select(
        "doc_id", "quality_score"
    )
    joined = comp.join(scores, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", "doc_id", "quality_score")
    )


@register(
    "llm_repetition_stats",
    """
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_distinct_words AS BIGINT) AS n_distinct_words,
           round(1.0 - n_distinct_words / n_words, 4) AS dup_word_ratio,
           CAST(max_word_count AS BIGINT) AS max_word_count
    FROM (
      SELECT doc_id,
             len(ws) AS n_words,
             len(list_distinct(ws)) AS n_distinct_words,
             (SELECT max(c) FROM (
                SELECT count(*) AS c FROM unnest(ws) AS t(w) GROUP BY w
             )) AS max_word_count
      FROM (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
      )
    ) WHERE n_words > 0
    """,
)
def llm_repetition_stats(spark, sf_dir):
    """Repetition-based quality features (the Gopher-rules shape):
    duplicate-word ratio and the hottest word's count per document —
    high repetition flags boilerplate/spam for pre-training filters.
    Pure column expressions: distinct count via array ops, the max
    word frequency via aggregate over a sorted array (no explode, no
    shuffle — each doc computes locally)."""
    d = _t(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    sorted_ws = F.array_sort(ws)
    # max run length in the sorted array == max word frequency
    run = F.aggregate(
        sorted_ws,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1))
            .otherwise(acc["run"] + 1)
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1)).otherwise(
                    acc["run"] + 1
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    out = d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct_words"),
        run.cast("long").alias("max_word_count"),
    ).filter(F.col("n_words") > 0)
    return out.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.round(1.0 - F.col("n_distinct_words") / F.col("n_words"), 4).alias(
            "dup_word_ratio"
        ),
        "max_word_count",
    )


@register(
    "llm_minhash_jaccard_estimate",
    f"""
    WITH {SHINGLES_SQL}, {MINHASH_SQL},
    banded AS (
      SELECT doc_id, md5(mh1 || '|' || mh2) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, md5(mh3 || '|' || mh4) AS band_key FROM mh
    ),
    pairs AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM banded l JOIN banded r ON l.band_key = r.band_key AND l.doc_id < r.doc_id
    ),
    est AS (
      SELECT p.a, p.b,
             ((CASE WHEN ma.mh1 = mb.mh1 THEN 1 ELSE 0 END)
            + (CASE WHEN ma.mh2 = mb.mh2 THEN 1 ELSE 0 END)
            + (CASE WHEN ma.mh3 = mb.mh3 THEN 1 ELSE 0 END)
            + (CASE WHEN ma.mh4 = mb.mh4 THEN 1 ELSE 0 END)) / 4.0 AS est_jaccard
      FROM pairs p JOIN mh ma ON ma.doc_id = p.a JOIN mh mb ON mb.doc_id = p.b
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.a, p.b, count(*) AS n_inter
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.a
      JOIN sh sb ON sb.doc_id = p.b AND sb.shingle = sa.shingle
      GROUP BY p.a, p.b
    )
    SELECT e.a, e.b, round(e.est_jaccard, 4) AS est_jaccard,
           round(i.n_inter / (za.sz + zb.sz - i.n_inter), 4) AS exact_jaccard
    FROM est e
    JOIN inter i ON i.a = e.a AND i.b = e.b
    JOIN sizes za ON za.doc_id = e.a
    JOIN sizes zb ON zb.doc_id = e.b
    """,
)
def llm_minhash_jaccard_estimate(spark, sf_dir):
    """The MinHash ESTIMATOR property made explicit: for every LSH
    candidate pair, the fraction of agreeing signature components
    (an unbiased estimate of Jaccard) next to the exact shingle-set
    Jaccard — the number the whole minhash/banding stack approximates.
    Candidate-bounded: both columns computed only on LSH pairs."""
    d = _t(spark, sf_dir, "documents")
    sh = char_shingles(d)
    sigs = minhash_from_docs(d)
    pairs = lsh_candidate_pairs(sigs)
    ma = sigs.select(
        F.col("doc_id").alias("a"), *[F.col(c).alias(f"a_{c}") for c in ["mh1", "mh2", "mh3", "mh4"]]
    )
    mb = sigs.select(
        F.col("doc_id").alias("b"), *[F.col(c).alias(f"b_{c}") for c in ["mh1", "mh2", "mh3", "mh4"]]
    )
    agree = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0) for i in range(1, 5)
    )
    est = pairs.join(ma, "a").join(mb, "b").select(
        "a", "b", F.round(agree / 4.0, 4).alias("est_jaccard")
    )
    exact = jaccard_pairs(sh, pairs).select(
        "a", "b", F.col("jaccard").alias("exact_jaccard")
    )
    return est.join(exact, ["a", "b"]).select("a", "b", "est_jaccard", "exact_jaccard")


@register(
    "llm_chunk_dedup_stats",
    """
    SELECT count(*) AS n_chunks,
           count(DISTINCT md5(chunk_text)) AS n_unique_chunks,
           round(1.0 - count(DISTINCT md5(chunk_text)) / count(*), 4) AS chunk_dup_ratio
    FROM (
      SELECT array_to_string(
               list_slice(ws, start, least(start + 19, len(ws))), ' ') AS chunk_text
      FROM (
        SELECT ws, unnest(generate_series(1, greatest(len(ws) - 5, 1), 15)) AS start
        FROM (
          SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents
        )
      )
      WHERE len(list_slice(ws, start, least(start + 19, len(ws)))) > 0
    )
    """,
)
def llm_chunk_dedup_stats(spark, sf_dir):
    """Chunk-level dedup cardinality: after chunking, how much of the
    corpus is repeated chunks (boilerplate shared across documents) —
    the dedup decision moves from document granularity to training-
    sample granularity. Shuffles 16-byte chunk fingerprints, never
    chunk text."""
    from .llm.prep import chunk_documents

    chunks = chunk_documents(_t(spark, sf_dir, "documents"))
    fp = chunks.select(F.md5("chunk_text").alias("fp"))
    return fp.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("fp").alias("n_unique_chunks"),
        F.round(1.0 - F.countDistinct("fp") / F.count(F.lit(1)), 4).alias(
            "chunk_dup_ratio"
        ),
    )


@register(
    "llm_embedding_centroids",
    """
    SELECT label, CAST(pos - 1 AS INT) AS pos, round(avg(v), 4) + 0 AS mean_val
    FROM (
      SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def llm_embedding_centroids(spark, sf_dir):
    """Per-label embedding centroids in long form (label, dim, mean):
    posexplode -> partial-aggregable avg per (label, dim). Rows scale
    as n x dim — the standard distributed element-wise mean; the
    shuffle carries |labels| x dim partials, not vectors."""
    e = _t(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "v"
        ),
    )
    # `+ 0` normalizes IEEE negative zero (round of a tiny negative
    # mean gives -0.0 in one engine, 0.0 in the other — seen at sf0.001)
    return exploded.groupBy("label", "pos").agg(
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean_val")
    )


@register(
    "llm_nearest_centroid_accuracy",
    """
    WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT label AS c_label, list(mean_val ORDER BY pos) AS cv FROM (
        SELECT label, pos, avg(v) AS mean_val FROM (
          SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings
        ) GROUP BY label, pos
      ) GROUP BY label
    ),
    scored AS (
      SELECT b.vec_id, b.label,
             (SELECT c.c_label FROM cent c
              ORDER BY list_dot_product(b.v, c.cv)
                       / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                       c.c_label ASC
              LIMIT 1) AS pred
      FROM base b
    )
    SELECT count(*) AS n,
           CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM scored
    """,
)
def llm_nearest_centroid_accuracy(spark, sf_dir):
    """Nearest-centroid classification, EXACTLY oracle-checked (no
    invariant needed: centroids, cosine, and argmax are all
    deterministic arithmetic both engines can run). Spark shape:
    centroids collected per label (|labels| x dim — tiny), broadcast
    as a cross-joined literal-free dim, per-vector argmax via a
    window; corpus scanned once."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exploded = e.select("label", F.posexplode("v").alias("pos", "x"))
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col("label").alias("c_label"),
            F.transform("pm", lambda s: s["m"]).alias("cv"),
        )
    )
    from .llm.similarity import cosine

    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("c_label").asc())
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("c_label").alias("pred"))
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("label") == F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )


@register(
    "llm_vector_quantize",
    """
    WITH mm AS (
      SELECT min(v) AS lo, max(v) AS hi FROM (
        SELECT unnest(CAST(embedding AS DOUBLE[])) AS v FROM embeddings
      )
    ),
    coded AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(least(floor((x - mm.lo) / (mm.hi - mm.lo) * 256), 255)
                         AS BIGINT)
             ) AS codes
      FROM embeddings, mm
      WHERE vec_id < 50
    )
    SELECT vec_id, CAST(i - 1 AS INT) AS dim_idx, codes[i] AS code
    FROM (SELECT vec_id, codes, unnest(generate_series(1, len(codes))) AS i
          FROM coded)
    """,
)
def llm_vector_quantize(spark, sf_dir):
    """int8-range scalar quantization of embeddings (corpus-global
    min/max): 4 bytes/dim -> 1, the standard storage/bandwidth
    compression before ANN at 100 TB. floor (never round) keeps the
    code arithmetic bit-identical across engines; the min/max pass is
    one partial-aggregable scan, applied as broadcast literals. Codes
    are posexploded to (vec_id, dim_idx, code) scalar rows — the
    driver's canonicalizer cannot hash raw array cells (round-3
    lesson from llm_embedding_truncate)."""
    e = _t(spark, sf_dir, "embeddings")
    mm = e.select(F.explode(F.transform("embedding", lambda x: x.cast("double"))).alias("v")).agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    lo, hi = mm.lo, mm.hi
    codes = F.transform(
        F.col("embedding"),
        lambda x: F.least(
            F.floor((x.cast("double") - F.lit(lo)) / F.lit(hi - lo) * 256), F.lit(255.0)
        ).cast("long"),
    )
    return e.filter(F.col("vec_id") < 50).select(
        "vec_id", F.posexplode(codes).alias("dim_idx", "code")
    )


@register(
    "llm_pack_sequences",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS bin
    FROM c
    """,
)
def llm_pack_sequences(spark, sf_dir):
    """Context-window packing (training-sequence binning): docs in id
    order fill 512-token bins; bin = exclusive running token total //
    budget. The running total is a DISTRIBUTED prefix sum
    (llm/prep.with_running_total: range partition -> parallel
    per-partition cumsum -> broadcast per-partition offsets), not the
    single-task global window the oracle's `sum() OVER (ORDER BY)`
    implies — same answer, cluster-scalable plan."""
    from .llm.prep import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), budget=512)


@register(
    "llm_source_mix",
    """
    WITH w AS (
      SELECT doc_id, source,
             ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS bucket,
             CASE CAST(substr(source, 4) AS INT) % 4
               WHEN 0 THEN 65536 WHEN 1 THEN 32768 WHEN 2 THEN 16384 ELSE 8192
             END AS threshold
      FROM documents
    )
    SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
    FROM w WHERE bucket < threshold GROUP BY source
    """,
)
def llm_source_mix(spark, sf_dir):
    """Data mixing: deterministic per-source down-sampling with weights
    1 / 0.5 / 0.25 / 0.125 by source group (srcN, N mod 4). Keep/drop
    is a pure function of the doc id (16-bit md5 bucket vs weight
    threshold — llm/prep.source_weighted_sample): reproducible across
    runs, engines, and cluster sizes, and any row's fate is auditable.
    Output: per-source kept count + id-sum digest."""
    from .llm.prep import source_weighted_sample

    d = _t(spark, sf_dir, "documents")
    weight = (
        F.when(F.substring("source", 4, 10).cast("int") % 4 == 0, F.lit(1.0))
        .when(F.substring("source", 4, 10).cast("int") % 4 == 1, F.lit(0.5))
        .when(F.substring("source", 4, 10).cast("int") % 4 == 2, F.lit(0.25))
        .otherwise(F.lit(0.125))
    )
    kept = source_weighted_sample(d, weight)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("sum_kept_ids")
    )


@register(
    "llm_quality_filter_by_lang",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             round((CASE WHEN n_tokens >= 20 THEN 0.4::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.3::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN n_punct / n_chars_calc <= 0.1 THEN 0.2::DOUBLE ELSE 0.0 END)
                 + (CASE WHEN n_stop > 0 THEN 0.1::DOUBLE ELSE 0.0 END), 4) AS quality_score
      FROM (
        SELECT doc_id, lang,
               length(text) AS n_chars_calc,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
               length(replace(text, ' ', ''))
                 / len(list_filter(string_split(text, ' '), x -> x <> '')) AS mean_word_len,
               {_HITS_SQL["en"]} AS n_stop
        FROM documents
      )
    ),
    ranked AS (
      SELECT doc_id, lang, quality_score,
             percent_rank() OVER (PARTITION BY lang
                                  ORDER BY quality_score, doc_id) AS pr
      FROM scored
    )
    SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids,
           round(min(quality_score), 4) AS min_kept_score
    FROM ranked WHERE pr >= CAST(0.1 AS DOUBLE) GROUP BY lang
    """,
)
def llm_quality_filter_by_lang(spark, sf_dir):
    """Percentile-based quality filtering within each language: drop
    the bottom decile of composite quality score PER LANGUAGE (the
    standard way to quality-filter multilingual pretraining data
    without starving low-resource languages). percent_rank over a
    lang-partitioned window — parallel across languages, no global
    sort; deterministic doc_id tiebreak for oracle parity."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = ts.with_quality_score(d).select("doc_id", "lang", "quality_score")
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    kept = scored.withColumn("pr", F.percent_rank().over(w)).filter(
        F.col("pr") >= 0.1
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_kept_ids"),
        F.round(F.min("quality_score"), 4).alias("min_kept_score"),
    )


@register(
    "llm_embedding_truncate",
    """
    WITH t AS (
      SELECT vec_id, list_slice(embedding::DOUBLE[], 1, 8) AS v8
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, v8, sqrt(list_dot_product(v8, v8)) AS nrm FROM t
    ),
    e AS (
      SELECT vec_id, v8, nrm,
             unnest(generate_series(1, len(v8))) AS i
      FROM n
    )
    SELECT vec_id,
           CAST(i - 1 AS INT) AS dim_idx,
           round(v8[i] / nrm, 4) + 0 AS unit_val,
           round(nrm, 4) AS trunc_norm
    FROM e
    """,
)
def llm_embedding_truncate(spark, sf_dir):
    """Matryoshka-style embedding truncation: keep the first 8 of 64
    dims and L2-renormalize — the cheap dimension-reduction step used
    to trade recall for cost in vector pipelines. Pure array
    expressions (slice / zip-fold dot / transform), no UDF; `+ 0`
    normalizes IEEE -0.0 identically in both engines. Output is
    posexploded to one (vec_id, dim_idx, unit_val) row per kept
    dimension so every column is a hashable scalar."""
    from .llm.similarity import _as_double, dot

    e = _t(spark, sf_dir, "embeddings")
    v8 = F.slice(_as_double(F.col("embedding")), 1, 8)
    base = e.select("vec_id", v8.alias("v8"))
    nrm = F.sqrt(dot(F.col("v8"), F.col("v8")))
    base = base.select("vec_id", "v8", nrm.alias("nrm"))
    unit = F.transform(F.col("v8"), lambda x: F.round(x / F.col("nrm"), 4) + 0)
    return base.select(
        "vec_id",
        F.posexplode(unit).alias("dim_idx", "unit_val"),
        F.round("nrm", 4).alias("trunc_norm"),
    )


@register(
    "llm_decontaminate",
    """
    WITH grams AS (
      SELECT doc_id,
             array_to_string(list_slice(ws, i, i + 7), ' ') AS g8
      FROM (
        SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - 7, 1))) AS i
        FROM (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents
        )
      )
    ),
    eval_grams AS (SELECT DISTINCT g8 FROM grams WHERE doc_id < 5),
    contaminated AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN eval_grams e ON g.g8 = e.g8
      WHERE g.doc_id >= 5
    )
    SELECT count(*) AS n_contaminated, CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM contaminated
    """,
)
def llm_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing any word
    8-gram with the eval set (doc_id < 5 stands in for a benchmark).
    The eval n-gram set is tiny and BROADCAST into a semi join against
    the corpus n-gram stream — the corpus is never shuffled, flags are
    proportional to true overlaps (the shape that holds when the corpus
    is 100 TB and the benchmark is a few MB)."""
    d = _t(spark, sf_dir, "documents")
    grams = word_ngrams(d, n=8, spread=True)
    eval_g = grams.filter(F.col("doc_id") < 5).select("shingle").distinct()
    hits = (
        grams.filter(F.col("doc_id") >= 5)
        .join(F.broadcast(eval_g), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_contaminated"),
        F.sum("doc_id").alias("sum_ids"),
    )


@register(
    "llm_unigram_logprob",
    """
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    vocab AS (
      SELECT w, CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM words) AS p
      FROM words GROUP BY w
    )
    SELECT doc_id, round(avg(ln(p)), 4) AS mean_logprob, count(*) AS n_words
    FROM words JOIN vocab USING (w)
    GROUP BY doc_id
    """,
)
def llm_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality scoring: corpus word frequencies -> mean log
    probability per document (the cheap stand-in for model-based
    perplexity filtering; outlier docs score low). Two partial-
    aggregable groupBys + one equi-join on the word; the vocabulary is
    corpus-bounded (not row-bounded), so the join side stays small
    relative to the corpus at any scale."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(ts.words_col(F.col("text"))).alias("w")
    )
    # corpus total as a lazy 1-row broadcast, not an eager .count():
    # keeps the whole scorer one declarative plan
    total = words.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .crossJoin(F.broadcast(total))
        .select("w", (F.col("__c") / F.col("__total")).alias("p"))
    )
    return (
        words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log("p")), 4).alias("mean_logprob"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
