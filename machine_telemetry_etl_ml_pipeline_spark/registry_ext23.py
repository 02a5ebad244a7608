"""Twenty-third extension batch (round 6, part 8): sequential state
inference, diversified retrieval, and a readability screen.

- `ml_hmm_forward`: 2-state HMM forward-posterior over each user's
  event-type sequence (normalized/scaled forward algorithm, fixed
  transition + emission tables). The per-user recursion is a
  SEQUENTIAL fold in (ts, event_id) order — Spark folds a sorted
  collect_list with F.aggregate, the oracle walks a recursive CTE
  over the same row_number — and every step is multiply/divide only
  (NO exp/log anywhere), so the final posteriors are bitwise
  identical cross-engine by IEEE determinism, not by rounding.
- `llm_mmr_rerank`: Maximal Marginal Relevance diversified top-5
  re-rank of the cosine top-20 candidates for one query vector
  (lambda = 0.7) — the redundancy-aware retrieval layer between ANN
  and context packing. Similarities ride the proven 4dp-rounded
  cosine grid; each greedy selection is an argmax under a TOTAL
  (score DESC, vec_id) order, unrolled to the same 5 steps on both
  engines.
- `llm_readability_flesch`: Flesch reading-ease per source with a
  vowel-group syllable heuristic. Words / sentences / syllable
  groups are exact integers summed per source; the score is ONE
  IEEE formula over the summed integers (never an average of
  per-document floats).

Determinism contract: HMM floats are pure *// chains (IEEE exactly
rounded, engine-independent); MMR floats live on the 4dp cosine grid
with total-order argmax; readability floats are single formulas over
exact integer sums. Reference analog: none (extends the sequence /
retrieval / text-quality families)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.ckpt import checkpoint_rotate, note_live, retire_ids
from .registry import _t, register
from .llm.similarity import dot

# -- HMM tables (fixed, public-knowledge toy parameterization) -------------
# state 1 = "browsing", state 2 = "transacting"
_T11, _T12, _T21, _T22 = 0.8, 0.2, 0.3, 0.7
_EMIT1 = {"view": 0.4, "click": 0.3, "signup": 0.1, "purchase": 0.1, "error": 0.1}
_EMIT2 = {"view": 0.1, "click": 0.2, "signup": 0.1, "purchase": 0.5, "error": 0.1}


def _emit_case(col: str, table: dict[str, float]) -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in table.items())
    return f"(CASE {col} {whens} ELSE 0.1 END)"


def _hmm_step_sql(a1: str, a2: str, ty: str) -> tuple[str, str]:
    """The normalized forward step with every subterm inlined so the
    operation tree is literally identical on both engines."""
    e1 = _emit_case(ty, _EMIT1)
    e2 = _emit_case(ty, _EMIT2)
    u1 = f"(({a1} * {_T11} + {a2} * {_T21}) * {e1})"
    u2 = f"(({a1} * {_T12} + {a2} * {_T22}) * {e2})"
    return f"({u1} / ({u1} + {u2}))", f"({u2} / ({u1} + {u2}))"


_HMM_A1, _HMM_A2 = _hmm_step_sql("w.a1", "w.a2", "e.event_type")


@register(
    "ml_hmm_forward",
    f"""
    WITH RECURSIVE ev AS MATERIALIZED (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    seqlen AS (SELECT user_id, max(rn) AS len FROM ev GROUP BY user_id),
    walk(user_id, rn, a1, a2) AS (
      SELECT user_id, 0, CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE) FROM seqlen
      UNION ALL
      SELECT w.user_id, w.rn + 1, {_HMM_A1}, {_HMM_A2}
      FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    fin AS (
      SELECT w.user_id, w.a2 AS p_transacting, s.len
      FROM walk w JOIN seqlen s ON w.user_id = s.user_id AND w.rn = s.len
    )
    SELECT CAST(least(9, CAST(floor(p_transacting * 10) AS BIGINT)) AS BIGINT)
             AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           min(p_transacting) AS min_p,
           max(p_transacting) AS max_p
    FROM fin GROUP BY 1 ORDER BY band
    """,
)
def ml_hmm_forward(spark, sf_dir):
    """2-state HMM forward posterior P(transacting | event sequence)
    per user, via the normalized (scaled) forward algorithm with
    fixed transition/emission tables — sequence-model inference as a
    pure SQL fold. The recursion is a per-user SEQUENTIAL fold under
    the total (ts, event_id) order: Spark sorts the collected
    sequence and folds it with F.aggregate; the oracle walks the
    identical recursion as a recursive CTE — the ml_average_precision
    sequential-fold doctrine. Every step is multiply/divide over
    rational constants (the normalization replaces the usual
    log-likelihood scaling, so there is NO exp/ln anywhere), which
    makes the posteriors bitwise identical cross-engine by IEEE
    arithmetic alone; banding by floor(p*10) is then safe. Scale: one
    groupBy(user) shuffle to assemble sequences (bounded per-user
    arrays), the fold is narrow per-row work; at 100 TB this is the
    applyInPandasWithState/transformWithState shape, expressed
    statelessly. Reference analog: none (extends
    ml_markov_transition_matrix to latent state)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.struct("ts", "event_id", "event_type").alias("s")
    )
    seqs = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("s")).alias("seq")
    )
    a1_t, a2_t = _hmm_step_sql("acc.a1", "acc.a2", "x.event_type")
    fold = F.expr(
        f"""
        aggregate(
          seq,
          named_struct('a1', CAST(0.5 AS DOUBLE), 'a2', CAST(0.5 AS DOUBLE)),
          (acc, x) -> named_struct('a1', {a1_t}, 'a2', {a2_t})
        ).a2
        """
    )
    fin = seqs.select("user_id", fold.alias("p_transacting"))
    return (
        fin.groupBy(
            F.least(F.lit(9), F.floor(F.col("p_transacting") * 10))
            .cast("long")
            .alias("band")
        )
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.min("p_transacting").alias("min_p"),
            F.max("p_transacting").alias("max_p"),
        )
        .orderBy("band")
    )


_MMR_LAMBDA = 0.7
_MMR_K = 5
_MMR_CAND = 20


def _mmr_oracle() -> str:
    cos = (
        "round(list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv))"
        " * sqrt(list_dot_product(v, v))), 4)"
    )
    paircos = (
        "round(list_dot_product(c.v, s.v) / (sqrt(list_dot_product(c.v, c.v))"
        " * sqrt(list_dot_product(s.v, s.v))), 4)"
    )
    ctes = [
        "base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "q AS (SELECT v AS qv FROM base WHERE vec_id = 0)",
        f"""cand AS MATERIALIZED (
      SELECT vec_id, v, simq FROM (
        SELECT vec_id, v, {cos} AS simq,
               row_number() OVER (ORDER BY {cos} DESC, vec_id) AS rnk
        FROM base, q WHERE vec_id <> 0
      ) WHERE rnk <= {_MMR_CAND}
    )""",
        """s1 AS MATERIALIZED (
      SELECT 1 AS rank, vec_id, v, simq FROM cand
      ORDER BY simq DESC, vec_id LIMIT 1
    )""",
    ]
    for k in range(2, _MMR_K + 1):
        sel = " UNION ALL ".join(f"SELECT * FROM s{j}" for j in range(1, k))
        ctes.append(
            f"""s{k} AS MATERIALIZED (
      SELECT rank, vec_id, v, simq FROM (
        SELECT {k} AS rank, c.vec_id, c.v, c.simq,
               {_MMR_LAMBDA} * c.simq
                 - {round(1 - _MMR_LAMBDA, 10)} * (
                     SELECT max({paircos}) FROM ({sel}) s
                   ) AS score
        FROM cand c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM ({sel}))
      ) ORDER BY score DESC, vec_id
      LIMIT 1
    )"""
        )
    allsel = " UNION ALL ".join(f"SELECT * FROM s{j}" for j in range(1, _MMR_K + 1))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(rank AS BIGINT) AS rank, vec_id, simq AS sim_to_query
    FROM ({allsel}) ORDER BY rank"""
    )


@register("llm_mmr_rerank", _mmr_oracle())
def llm_mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance re-rank: greedy top-5 selection from
    the cosine top-20 candidates of query vec_id=0, score =
    0.7*sim(q,c) - 0.3*max_{s in selected} sim(c,s) — the
    diversity-aware retrieval layer (Carbonell & Goldstein 1998) an
    LLM pipeline runs between ANN recall and context packing.
    Exactness: all similarities live on the proven 4dp cosine grid,
    each greedy argmax carries a TOTAL (score DESC, vec_id) order,
    and both engines unroll the SAME 5 steps. Scale: the corpus is
    touched ONCE (the brute-force top-20, itself replaceable by the
    ANN path); every MMR step runs on the <=20-row candidate panel —
    driver-sized by construction, like the SemDeDup threshold sweep.
    Reference analog: none (extends llm_cosine_topk)."""
    base = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = base.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cosq = F.round(
        dot(F.col("qv"), F.col("v"))
        / (F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("v"), F.col("v")))),
        4,
    )
    cand, _cand_ids = checkpoint_rotate(
        base.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", cosq.alias("simq"))
        .orderBy(F.desc("simq"), F.asc("vec_id"))
        .limit(_MMR_CAND)
    )
    sel, sel_ids = checkpoint_rotate(
        cand.orderBy(F.desc("simq"), F.asc("vec_id"))
        .limit(1)
        .select(F.lit(1).alias("rank"), "vec_id", "v", "simq")
    )
    paircos = F.round(
        dot(F.col("c.v"), F.col("s.v"))
        / (
            F.sqrt(dot(F.col("c.v"), F.col("c.v")))
            * F.sqrt(dot(F.col("s.v"), F.col("s.v")))
        ),
        4,
    )
    for k in range(2, _MMR_K + 1):
        remaining = cand.join(sel.select("vec_id"), "vec_id", "left_anti")
        maxsim = (
            remaining.alias("c")
            .crossJoin(sel.alias("s"))
            .groupBy(F.col("c.vec_id").alias("vec_id"))
            .agg(F.max(paircos).alias("max_sel"))
        )
        nxt = (
            remaining.join(maxsim, "vec_id")
            .select(
                F.lit(k).alias("rank"),
                "vec_id",
                "v",
                "simq",
                (
                    F.lit(_MMR_LAMBDA) * F.col("simq")
                    - F.lit(round(1 - _MMR_LAMBDA, 10)) * F.col("max_sel")
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(1)
            .select("rank", "vec_id", "v", "simq")
        )
        # each greedy step's panel supersedes the previous one —
        # rotate its blocks out (operators/ckpt.py); cand stays, the
        # next step's anti-join still reads it
        sel, sel_ids = checkpoint_rotate(sel.unionAll(nxt), retire=sel_ids)
    retire_ids(spark, _cand_ids)  # last anti-join is done
    note_live(sel_ids)  # final greedy panel backs the returned frame
    return sel.select(
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        F.col("simq").alias("sim_to_query"),
    ).orderBy("rank")


@register(
    "llm_readability_flesch",
    """
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS words,
             CAST(greatest(1, length(text)
                  - length(replace(replace(replace(text, '.', ''),
                                           '!', ''), '?', ''))) AS BIGINT)
               AS sentences,
             CAST(length(regexp_replace(lower(text), '[aeiouy]+', '~', 'g'))
                  - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
                  AS BIGINT) AS syllables
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS words,
           CAST(sum(sentences) AS BIGINT) AS sentences,
           CAST(sum(syllables) AS BIGINT) AS syllables,
           206.835
             - 1.015 * (CAST(sum(words) AS DOUBLE) / sum(sentences))
             - 84.6 * (CAST(sum(syllables) AS DOUBLE) / sum(words))
             AS flesch
    FROM d GROUP BY source ORDER BY source
    """,
)
def llm_readability_flesch(spark, sf_dir):
    """Flesch reading-ease per corpus source, with the vowel-group
    syllable heuristic (a maximal [aeiouy]+ run ~ one syllable) — the
    readability screen next to llm_quality_score. Per-document word /
    sentence / syllable-group counts are exact integers (the group
    count is the length delta between collapsing runs to one char and
    deleting them); they sum per source exactly, and the score is ONE
    IEEE formula over the summed integers — never an average of
    per-document floats, so there is no order-dependent float sum
    anywhere. Scale: one scan, partial-aggregable per-source rollup;
    regex work is JVM-side codegen. Reference analog: none (extends
    llm_quality_score / llm_char_entropy)."""
    t = F.col("text")
    words = F.size(
        F.filter(F.split(t, " "), lambda x: x != F.lit(""))
    ).cast("long")
    # literal (non-regex) replace on BOTH engines — same builtin name,
    # same semantics, no regex-dialect risk
    sentences = F.greatest(
        F.lit(1),
        F.length(t)
        - F.length(F.expr("replace(replace(replace(text, '.', ''), '!', ''), '?', '')")),
    ).cast("long")
    syllables = (
        F.length(F.regexp_replace(F.lower(t), "[aeiouy]+", "~"))
        - F.length(F.regexp_replace(F.lower(t), "[aeiouy]+", ""))
    ).cast("long")
    d = _t(spark, sf_dir, "documents").select(
        "source",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("words"),
            F.sum("sentences").cast("long").alias("sentences"),
            F.sum("syllables").cast("long").alias("syllables"),
            (
                F.lit(206.835)
                - F.lit(1.015) * (F.sum("words").cast("double") / F.sum("sentences"))
                - F.lit(84.6) * (F.sum("syllables").cast("double") / F.sum("words"))
            ).alias("flesch"),
        )
        .orderBy("source")
    )
