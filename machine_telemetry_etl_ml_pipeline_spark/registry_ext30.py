"""Thirtieth extension batch (round 8): the corpus-size-parameterized
sign-LSH bucketing that fixes the one scale-killer the r7 verdict
named — the fixed-16-bucket pair family (`llm_semdedup_prune`,
`llm_embedding_neardup`) whose scored-pair space is ~n^2/16 forever
(measured 11.3x wall at 10x rows, SCALE.md "Round-7 wall-clock
scaling refresh").

Design (llm/similarity.py `adaptive_bits_expr`/`adaptive_sign_bucket`):
bits = clamp(ceil(log2(n / target_bucket_size)), 2, 16), B = 2^bits —
the SemDeDup paper's k ∝ n cluster-count scaling re-expressed for
sign-LSH, so expected per-bucket population (and with it scored pairs
PER ROW) stays ~constant as the corpus grows. One whole-stage-codegen
bucket expression serves every corpus size: no per-size plan rebuild,
no UDF. Hyperplane order is fixed, so growing bits REFINES buckets
(each splits in two) rather than reshuffling them.

r13 multiplicity fix (the r9 ab_gmm/ab_logistic doctrine applied
here): the r8-r12 shape carried the params row as a broadcast COLUMN,
but the bucketed base is SELF-JOINED — Spark duplicates the whole
subtree per join side, so the corpus was scanned and bucketed twice
and the params aggregate ran once per copy plus once in the final
projection (5 embeddings scans per entry). Now the 1-row params
aggregate is collected once (bounded; plancap-noted), `bits` folds in
as a literal — the VALUE Spark itself computed, so cross-engine
parity is untouched — and the bucketed+norm'd base is
localCheckpointed so both join sides read ONE materialization
(2 corpus scans total, the floor for count-then-bucket).

The two driver-green fixed-bucket entries stay untouched: their
outputs are DEFINED by their candidate sets, and re-speccing a
verified entry would silently change its answer. These scaled twins
carry their own DuckDB oracles mirroring the same adaptive bucketing
(log2/ceil are IEEE-identical on both engines), so the knob itself is
oracle-checked at every SF — bits=3 at the 500-row test tables,
bits=5 at sf0.1's 2000, bits=9 at the 10x replica's 20000.

Reference analog: none (LLM-data-pipeline extension; the fixed-bucket
originals cite the SemDeDup shape at registry_ext10.py:248,
registry_ext3.py:92).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .llm.similarity import (
    ADAPTIVE_SIGN_DIMS,
    _as_double,
    adaptive_bits_expr,
    adaptive_sign_bucket,
    dot,
    norm,
)
from .registry import _t, register

_TARGET_BUCKET = 64


def _adaptive_bucket_sql() -> str:
    """DuckDB mirror of adaptive_sign_bucket over the params.bits
    column: bit j is live iff j < bits and embedding[dims[j]] > 0."""
    terms = "\n           + ".join(
        f"(CASE WHEN p.bits > {j} AND embedding[{d}] > 0 THEN {2 ** j} ELSE 0 END)"
        for j, d in enumerate(ADAPTIVE_SIGN_DIMS)
    )
    return f"CAST({terms} AS INTEGER)"


_PARAMS_SQL = f"""
    params AS (
      SELECT LEAST(16, GREATEST(2,
               CAST(ceil(log2(CAST(count(*) AS DOUBLE) / {float(_TARGET_BUCKET)})) AS INTEGER)
             )) AS bits,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(vec_id) AS BIGINT) AS sum_ids
      FROM embeddings
    ),
    bb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_adaptive_bucket_sql()} AS bucket
      FROM embeddings CROSS JOIN params p
    ),
    pairs AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS s
      FROM bb a JOIN bb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
"""


def _adaptive_base(spark, sf_dir):
    """(params 1-row literal frame, CHECKPOINTED bucketed base frame
    with precomputed norms) — shared by both scaled entries. Norm
    hoisting per the r5 lesson: the inlined cosine re-folds both
    64-element aggregates per pair otherwise (measured 2.4x slower on
    the fixed-bucket twin). Params collected to literals + base
    localCheckpointed per the r13 multiplicity fix (module
    docstring): the self-join in _adaptive_pairs otherwise duplicates
    the whole scan+bucket subtree per side."""
    from .operators import plancap
    from .operators.ckpt import checkpoint_rotate, note_live

    e = _t(spark, sf_dir, "embeddings")
    params_df = e.agg(
        F.count(F.lit(1)).alias("n"), F.sum("vec_id").cast("long").alias("sum_ids")
    ).select(
        adaptive_bits_expr(F.col("n"), _TARGET_BUCKET).alias("bits"),
        F.col("n").cast("long").alias("n_total"),
        "sum_ids",
    )
    row = params_df.collect()[0]  # bounded 1-row collect
    plancap.note(params_df)
    if not row["n_total"]:
        # empty source table: log2(0) makes bits/sum_ids NULL and the
        # int() casts below would raise a bare TypeError (ADVICE r13).
        # Degrade to the clamp floor with zero totals — the bucketed
        # base is empty, so both scaled entries return zero rows, the
        # same thing the oracle computes over an empty table.
        bits, n_total, sum_ids = 2, 0, 0
    else:
        bits, n_total, sum_ids = int(row["bits"]), int(row["n_total"]), int(row["sum_ids"])
    base = e.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        adaptive_sign_bucket(F.col("embedding"), F.lit(bits)).alias("bucket"),
    ).withColumn("nrm", norm(F.col("v")))
    base, ids = checkpoint_rotate(base)
    note_live(ids)
    params = spark.range(1).select(
        F.lit(bits).cast("int").alias("bits"),
        F.lit(n_total).cast("long").alias("n_total"),
        F.lit(sum_ids).cast("long").alias("sum_ids"),
    )
    return params, base


def _adaptive_pairs(base):
    a, b = base.alias("a"), base.alias("b")
    return a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("ida"),
        F.col("b.vec_id").alias("idb"),
        F.round(
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
        ).alias("s"),
    )


@register(
    "llm_semdedup_prune_scaled",
    f"""
    WITH {_PARAMS_SQL},
    thresholds AS (SELECT CAST(thr AS DOUBLE) AS thr
                   FROM (VALUES (0.30), (0.35), (0.40)) t(thr)),
    dropped AS (
      SELECT t.thr, pr.idb AS vec
      FROM pairs pr CROSS JOIN thresholds t
      WHERE pr.s > t.thr
      GROUP BY t.thr, pr.idb
    )
    SELECT t.thr AS threshold,
           CAST(p.bits AS INTEGER) AS bits,
           p.n_total,
           CAST(coalesce(count(d.vec), 0) AS BIGINT) AS n_dropped,
           p.n_total - CAST(coalesce(count(d.vec), 0) AS BIGINT) AS n_kept,
           p.sum_ids - CAST(coalesce(sum(d.vec), 0) AS BIGINT) AS sum_kept_ids
    FROM thresholds t CROSS JOIN params p LEFT JOIN dropped d ON d.thr = t.thr
    GROUP BY t.thr, p.bits, p.n_total, p.sum_ids
    """,
)
def llm_semdedup_prune_scaled(spark, sf_dir):
    """SemDeDup-style keep-first pruning over ADAPTIVE sign-LSH
    candidate buckets (B = 2^bits, bits ∝ log2(n/64)) — the
    100 TB-shaped twin of the pinned fixed-16-bucket
    `llm_semdedup_prune`. Identical keep/drop semantics (drop every
    vector with a LOWER-id neighbor above threshold; similarities
    rounded 1e-6 BEFORE thresholding so the cut is engine-invariant;
    retention digested as count + id-sum of keepers), but the scored
    pair space is ~n * target_bucket instead of n^2/16. `bits` is
    emitted so the oracle checks the knob itself at every SF."""
    params, base = _adaptive_base(spark, sf_dir)
    pairs = _adaptive_pairs(base)
    thresholds = spark.range(1).select(
        F.explode(F.array(F.lit(0.30), F.lit(0.35), F.lit(0.40))).alias("thr")
    )
    # r14 (guide §2.3): "idb dropped at thr" ⟺ max over idb's pair
    # similarities exceeds thr (s is rounded 1e-6 BEFORE both, and max
    # on doubles has no summation order), so one partial-aggregable
    # max per idb replaces the r13 (thr, idb) distinct — that shape
    # exploded pairs x |thresholds| (~4M rows at sf0.1) into a
    # distinct exchange; this one exchanges |idb| rows once and the
    # threshold fan-out runs over the ~n-row smax table. A/B at sf0.1
    # (5 interleaved noop reps, min): 2.45s -> 1.60s, outputs
    # identical at sf0.001/sf0.01.
    smax = pairs.groupBy("idb").agg(F.max("s").alias("smax"))
    agg = (
        smax.crossJoin(F.broadcast(thresholds))
        .filter(F.col("smax") > F.col("thr"))
        .groupBy("thr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dropped_raw"),
            F.sum("idb").cast("long").alias("sum_dropped_raw"),
        )
    )
    return (
        thresholds.join(agg, "thr", "left")
        .crossJoin(F.broadcast(params))
        .select(
            F.col("thr").alias("threshold"),
            F.col("bits").cast("int").alias("bits"),
            "n_total",
            F.coalesce(F.col("n_dropped_raw"), F.lit(0))
            .cast("long")
            .alias("n_dropped"),
            (F.col("n_total") - F.coalesce(F.col("n_dropped_raw"), F.lit(0)))
            .cast("long")
            .alias("n_kept"),
            (F.col("sum_ids") - F.coalesce(F.col("sum_dropped_raw"), F.lit(0)))
            .cast("long")
            .alias("sum_kept_ids"),
        )
    )


@register(
    "llm_embedding_neardup_scaled",
    f"""
    WITH {_PARAMS_SQL}
    SELECT ida AS a, idb AS b, round(s, 4) AS cosine_sim
    FROM pairs
    WHERE s > 0.35
    """,
)
def llm_embedding_neardup_scaled(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs from ADAPTIVE sign-LSH
    buckets — the scale-parameterized twin of the pinned fixed-bucket
    `llm_embedding_neardup` (registry_ext3.py:92): same exact-cosine
    verification above 0.35, candidate space ~n * target_bucket
    instead of n^2/16. Rounded 1e-6 before the threshold (the shared
    pair table convention), re-rounded to 4dp for output parity with
    the fixed twin."""
    _params, base = _adaptive_base(spark, sf_dir)
    return (
        _adaptive_pairs(base)
        .filter(F.col("s") > 0.35)
        .select(
            F.col("ida").alias("a"),
            F.col("idb").alias("b"),
            F.round(F.col("s"), 4).alias("cosine_sim"),
        )
    )
