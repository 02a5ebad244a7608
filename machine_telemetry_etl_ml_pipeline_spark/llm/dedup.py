"""Deduplication operators for LLM training-data pipelines
(north-star extension; no reference implementation — SURVEY §2B).

All hashing is md5-based and *lexicographic*: a MinHash permutation is
any uniform hash ordering, so `min(md5(seed || shingle))` over the
shingle set is a valid MinHash signature component — and, being plain
string ops, it computes identically in Spark and any ANSI engine
(oracle-parity by construction, no murmur3/xxhash divergence).

Scale posture:
- exact dedup: one shuffle on the 128-bit fingerprint (never on the
  full text) + min(doc_id) keep-first;
- MinHash: one explode (rows x shingles), one partial-aggregable
  groupBy — no quadratic stage;
- LSH banding: self-equi-join on the band key, so candidate generation
  is proportional to true collisions, not n^2; exact verification
  (Jaccard) only runs on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- normalization / fingerprinting ---------------------------------------


def normalized(col) -> "F.Column":
    """lower -> strip non-alphanumerics -> collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """128-bit content fingerprint + normalized-content fingerprint."""
    return df.withColumn("fp", F.md5(F.col(text_col))).withColumn(
        "fp_norm", F.md5(normalized(F.col(text_col)))
    )


def exact_dedup_keep_first(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One representative (smallest id) per exact content fingerprint."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )


# --- shingling -------------------------------------------------------------


def char_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5) -> DataFrame:
    """Distinct k-character shingles per document (one explode)."""
    idx = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1)))
    ).alias("i")
    return (
        df.select(F.col(id_col), F.col(text_col), idx)
        .select(F.col(id_col), F.expr(f"substring({text_col}, i, {k})").alias("shingle"))
        .distinct()
    )


def word_ngrams(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    idx = F.explode(F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))).alias("i")
    return (
        df.select(F.col(id_col), words.alias("__ws"), idx)
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.slice(F.col("__ws"), F.col("i"), n)).alias("shingle"),
        )
        .distinct()
    )


# --- MinHash + LSH ---------------------------------------------------------


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 4
) -> DataFrame:
    """num_hashes MinHash components per doc: min over the shingle set
    of md5 under per-component seeds. Partial-aggregable (map-side
    combine) — the whole signature is one groupBy."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(1, num_hashes + 1)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", rows_per_band: int = 2
) -> DataFrame:
    """Band the signature and self-join per band: docs agreeing on ALL
    components of any band become a candidate pair (standard MinHash
    LSH banding). Returns distinct (a, b) with a < b."""
    mh_cols = [c for c in signatures.columns if c.startswith("mh")]
    bands = [mh_cols[i : i + rows_per_band] for i in range(0, len(mh_cols), rows_per_band)]
    pairs = None
    for bi, cols in enumerate(bands):
        keyed = signatures.select(
            F.col(id_col), F.md5(F.concat_ws("|", *cols)).alias("band_key")
        )
        left = keyed.alias("l")
        right = keyed.alias("r")
        p = (
            left.join(right, F.col("l.band_key") == F.col("r.band_key"))
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def jaccard_pairs(shingles: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard over distinct-shingle sets, evaluated ONLY for the
    given candidate pairs (verification stage of the LSH pipeline)."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col(id_col).alias("a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        pairs.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 4
            ).alias("jaccard"),
        )
    )


# --- SimHash ----------------------------------------------------------------


def simhash16(shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """16-dimensional SimHash over the shingle set.

    Each dimension d in 1..16 reads the d-th hex digit of md5(shingle)
    (a uniform 4-bit hash); the dimension's bit is 1 iff the mean digit
    exceeds 7.5. Hex-digit arithmetic keeps the whole computation in
    portable string/integer ops (one groupBy, 16 partial-aggregable
    sums) instead of 64 bit-twiddles per shingle.
    """
    hexd = F.md5(F.col("shingle"))
    digit = lambda p: F.instr(F.lit("0123456789abcdef"), F.substring(hexd, p, 1)) - 1  # noqa: E731
    aggs = [F.sum(digit(p) - 7.5).alias(f"__s{p}") for p in range(1, 17)]
    sums = shingles.groupBy(id_col).agg(*aggs)
    bits = [
        (F.when(F.col(f"__s{p}") > 0, F.lit(2 ** (p - 1))).otherwise(F.lit(0)))
        for p in range(1, 17)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return sums.select(F.col(id_col), total.cast("long").alias("simhash"))
