"""Twenty-fourth extension batch (round 6, part 9): keyword
extraction, classifier-diagnostic crossovers, ensemble voting,
leakage-free label generation, and the dynamic-partition-pruning
scan surface.

- `llm_keyword_rake`: RAKE keyword extraction (Rose et al. 2010) —
  phrases are maximal stopword/non-alpha-free word runs, word score
  = degree/frequency, phrase score = sum of member word scores under
  a positional sequential fold. The corpus-wide top-15 keywords.
- `llm_langid_confusion`: confusion matrix of the stopword-hit
  language-ID heuristic (llm_language_id) against the labeled lang
  column, with per-cell corpus share — the eval layer over the
  existing screen. All-integer counts + one division per cell.
- `ml_random_forest_vote`: a 5-stump bagged ensemble — each stump
  trains on a deterministic md5-bootstrap (~2/3) subset and picks
  the accuracy-optimal threshold by exact integer argmax; majority
  vote is compared against truth. No RNG, no floats in training.
- `ml_churn_labels_point_in_time`: leakage-free churn-label
  generation — per snapshot date, features look back 90 days and the
  label looks forward 90 days, so no row ever sees its own future
  (the point-in-time-correct join every training pipeline needs).
- `ext_dynamic_partition_pruning`: the DPP scan surface — facts
  written partitioned by order year, joined to a filtered 1-row dim;
  Spark's dynamic partition pruning turns the dim filter into a
  partition skip at the fact scan (plan-asserted in tests).

Determinism contract: every aggregate that touches data volume is an
exact integer (counts, degrees, md5 bytes, day diffs); the only
doubles are degree/frequency ratios combined under positional
sequential folds, and single end divisions. Reference analog: none
(extends the text / ML-eval / ensemble / training-prep families)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import plancap
from .registry import _t, register
from .llm import textstats as ts

# RAKE phrase breakers: EN stopwords (the llm_language_id list) or any
# token that is not a pure lowercase-alpha run.
_RAKE_STOPS = ts.STOPWORDS["en"]
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _RAKE_STOPS) + "]"
_MAX_PHRASE = 4


@register(
    "llm_keyword_rake",
    f"""
    WITH words AS (
      SELECT doc_id, lower(w) AS w, pos FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
               generate_subscripts(list_filter(string_split(text, ' '),
                                               x -> x <> ''), 1) AS pos
        FROM documents
      )
    ),
    flagged AS (
      SELECT doc_id, w, pos,
             CASE WHEN list_contains({_STOP_SQL}, w)
                       OR NOT regexp_full_match(w, '[a-z]+')
                  THEN 1 ELSE 0 END AS brk
      FROM words
    ),
    seg AS (
      SELECT doc_id, w, pos, brk,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
      FROM flagged
    ),
    pw AS (SELECT doc_id, seg_id, w, pos FROM seg WHERE brk = 0),
    plen AS (
      SELECT doc_id, seg_id, CAST(count(*) AS BIGINT) AS n_words
      FROM pw GROUP BY doc_id, seg_id
      HAVING count(*) <= {_MAX_PHRASE}
    ),
    member AS (
      SELECT p.doc_id, p.seg_id, p.w, p.pos, l.n_words
      FROM pw p JOIN plen l ON p.doc_id = l.doc_id AND p.seg_id = l.seg_id
    ),
    wstat AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(n_words) AS BIGINT) AS degree
      FROM member GROUP BY w
    ),
    scored AS (
      SELECT m.doc_id, m.seg_id, m.pos,
             CAST(s.degree AS DOUBLE) / s.freq AS wscore
      FROM member m JOIN wstat s ON m.w = s.w
    ),
    folded AS (
      SELECT doc_id, seg_id,
             sum(wscore) OVER (PARTITION BY doc_id, seg_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS score,
             row_number() OVER (PARTITION BY doc_id, seg_id
                                ORDER BY pos DESC) AS rn_last
      FROM scored
    ),
    ptext AS (
      SELECT doc_id, seg_id, string_agg(w, ' ' ORDER BY pos) AS phrase
      FROM member GROUP BY doc_id, seg_id
    ),
    phrases AS (
      SELECT t.phrase, f.score
      FROM folded f JOIN ptext t
        ON f.doc_id = t.doc_id AND f.seg_id = t.seg_id
      WHERE f.rn_last = 1
    )
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           min(score) AS rake_score
    FROM phrases
    GROUP BY phrase
    ORDER BY min(score) DESC, phrase
    LIMIT 15
    """,
)
def llm_keyword_rake(spark, sf_dir):
    """RAKE (Rapid Automatic Keyword Extraction): candidate phrases
    are maximal runs of non-stopword, pure-alpha tokens (phrase
    boundaries via a conditional-cumsum segment id — the
    ext_conditional_reset_cumsum pattern); word score = degree/freq
    over all phrase memberships; a phrase scores the SUM of its word
    scores, folded in POSITION order (the sequential-fold doctrine,
    so the float sum has one tree on both engines); corpus top-15
    under a total (score DESC, phrase) order. Identical phrases score
    identically by construction, so min(score) == max(score) per
    group — min() is just the deterministic pick.
    r14 session 2 (guide §2.3/§2.4 — aggregate before you shuffle):
    segmentation now runs IN-ROW with higher-order functions, so no
    token-level row ever reaches an exchange. Break tokens are
    rewritten to a control-char sentinel, the token array is joined
    and re-split on it, and each piece IS a phrase occurrence —
    collision-free by construction because every non-break token
    matches ^[a-z]+$ and so can never contain the sentinel. The old
    shape shuffled all O(tokens) rows into a per-doc window for the
    conditional-cumsum seg_id (the r9-r13 lineage: tools/ab_rake.py
    2.03s -> 1.56s had already removed two of its three token-level
    passes). Downstream, everything is phrase-keyed: occurrences
    group straight to (phrase, n), word stats explode the DISTINCT
    phrase table with occurrence multiplicities (freq = sum(n),
    degree = sum(n * n_words) — the same per-membership counts), and
    the position-ordered fold runs once per distinct phrase (every
    occurrence folds identically, exactly why min() was already just
    a pick). A/B at sf0.1: 1.014 -> 0.610 s min over 5 interleaved
    reps, every rep pairwise faster; top-15 rows bit-identical
    (rake_score compared by IEEE bit pattern) at all three SFs.
    Scale: one in-row pass (O(tokens) work, zero token shuffles),
    phrase- and vocabulary-bounded exchanges only. The wstat join
    stays unhinted: AQE picks broadcast at runtime while the
    vocabulary is small but degrades to a shuffle join instead of
    OOMing if real text blows past the threshold (ADVICE r9).
    Reference analog: none (extends llm_tfidf_topk_terms with
    phrase-level extraction)."""
    sent = "\x01"
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    low = F.transform(toks, lambda x: F.lower(x))
    mapped = F.transform(
        low,
        lambda w: F.when(
            w.isin(*_RAKE_STOPS) | ~w.rlike("^[a-z]+$"), F.lit(sent)
        ).otherwise(w),
    )
    phrases_arr = F.filter(
        F.transform(
            F.split(F.array_join(mapped, " "), sent), lambda p: F.trim(p)
        ),
        lambda p: p != F.lit(""),
    )
    occ = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(phrases_arr).alias("phrase"))
        .where(F.size(F.split(F.col("phrase"), " ")) <= _MAX_PHRASE)
    )
    counts = occ.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    pw = counts.select(
        "phrase",
        "n_occurrences",
        F.posexplode(F.split(F.col("phrase"), " ")).alias("i", "w"),
        F.size(F.split(F.col("phrase"), " ")).alias("n_words"),
    )
    wstat = pw.groupBy("w").agg(
        F.sum("n_occurrences").cast("long").alias("freq"),
        F.sum(F.col("n_occurrences") * F.col("n_words"))
        .cast("long")
        .alias("degree"),
    )
    scored = (
        pw.join(wstat, "w")
        .groupBy("phrase")
        .agg(
            F.min("n_occurrences").alias("n_occurrences"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "i",
                        (F.col("degree").cast("double") / F.col("freq")).alias(
                            "wscore"
                        ),
                    )
                )
            ).alias("sws"),
        )
        .select(
            "phrase",
            "n_occurrences",
            F.aggregate(
                F.col("sws"), F.lit(0.0), lambda acc, s: acc + s["wscore"]
            ).alias("rake_score"),
        )
    )
    return scored.orderBy(F.desc("rake_score"), F.asc("phrase")).limit(15)


_HITS = {
    lang: (
        "len(list_intersect(list_filter(string_split(text, ' '), x -> x <> ''), "
        + "[" + ", ".join(f"'{w}'" for w in ts.STOPWORDS[lang]) + "]))"
    )
    for lang in ts.LANG_ORDER
}
_BEST = "greatest(" + ", ".join(f"hits_{l}" for l in ts.LANG_ORDER) + ")"
_PRED = (
    "CASE WHEN " + _BEST + " <= 0 THEN 'unknown' "
    + " ".join(f"WHEN hits_{l} = {_BEST} THEN '{l}'" for l in ts.LANG_ORDER)
    + " END"
)


@register(
    "llm_langid_confusion",
    f"""
    WITH pred AS (
      SELECT lang, {_PRED} AS pred_lang FROM (
        SELECT lang,
               {", ".join(f"CAST({_HITS[l]} AS INT) AS hits_{l}" for l in ts.LANG_ORDER)}
        FROM documents
      )
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pred)
    SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
           count(*) / (SELECT n FROM tot) AS share
    FROM pred GROUP BY lang, pred_lang
    ORDER BY lang, pred_lang
    """,
)
def llm_langid_confusion(spark, sf_dir):
    """Confusion matrix of the stopword-hit language-ID heuristic
    against the labeled lang column — the evaluation layer over
    llm_language_id (which emits per-doc predictions but never
    aggregates them). Cells are exact integer counts from one
    partial-aggregable scan; share is one IEEE division per cell
    against the broadcast total. The matrix is bounded by
    (|langs|+1)^2 cells at any SF. Reference analog: none (crosses
    llm_language_id with the ml_confusion_matrix shape)."""
    d = _t(spark, sf_dir, "documents").select(
        "lang", ts.predicted_lang(F.col("text")).alias("pred_lang")
    )
    tot = d.agg(F.count("*").cast("double").alias("n"))
    return (
        d.groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            (F.col("n_docs") / F.col("n")).alias("share"),
        )
        .orderBy("lang", "pred_lang")
    )


_N_TREES = 5
_HEXPOS = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"

_RF_ORACLE = f"""
    WITH labeled AS MATERIALIZED (
      SELECT l_orderkey * 10 + l_linenumber AS rid, l_quantity AS q,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    mem AS MATERIALIZED (
      -- tree t's bootstrap byte is byte t of ONE md5 per row (hex
      -- positions 2t+1, 2t+2): 1 hash instead of {_N_TREES}, same
      -- independence
      SELECT rid, q, y, t,
             CASE WHEN ((strpos('0123456789abcdef',
                                substr(h, 2 * t + 1, 1)) - 1) * 16
                        + (strpos('0123456789abcdef',
                                  substr(h, 2 * t + 2, 1)) - 1)) % 3 <> 0
                  THEN 1 ELSE 0 END AS in_bag
      FROM (
        SELECT rid, q, y, t, md5(CAST(rid AS VARCHAR) || ':bag') AS h
        FROM labeled, (SELECT CAST(range AS INT) AS t FROM range({_N_TREES}))
      )
    ),
    pv AS (
      SELECT t, q, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      FROM mem WHERE in_bag = 1 GROUP BY t, q
    ),
    tt AS (SELECT t, sum(n) AS nt, sum(pos) AS post FROM pv GROUP BY t),
    cum AS (
      SELECT t, q,
             sum(n) OVER (PARTITION BY t ORDER BY q) AS nl,
             sum(pos) OVER (PARTITION BY t ORDER BY q) AS posl
      FROM pv
    ),
    scored AS (
      -- predict y=1 on q <= threshold iff the left side is
      -- majority-positive; correct count is EXACT integers:
      -- best split maximizes correct = max(posl, nl-posl)
      --                              + max(post-posl, (nt-nl)-(post-posl))
      SELECT c.t, c.q AS threshold,
             greatest(c.posl, c.nl - c.posl)
               + greatest(tt.post - c.posl,
                          (tt.nt - c.nl) - (tt.post - c.posl)) AS correct,
             CASE WHEN c.posl * 2 >= c.nl THEN 1 ELSE 0 END AS left_pred,
             CASE WHEN (tt.post - c.posl) * 2 >= (tt.nt - c.nl)
                  THEN 1 ELSE 0 END AS right_pred
      FROM cum c JOIN tt ON c.t = tt.t
    ),
    best AS (
      SELECT t, threshold, left_pred, right_pred FROM (
        SELECT *, row_number() OVER (PARTITION BY t
                   ORDER BY correct DESC, threshold) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    model AS (
      SELECT list(threshold ORDER BY t) AS ths,
             list(left_pred ORDER BY t) AS lps,
             list(right_pred ORDER BY t) AS rps
      FROM best
    ),
    votes AS (
      SELECT l.y,
             list_sum(list_transform(range(1, {_N_TREES} + 1),
               i -> CASE WHEN l.q <= m.ths[i] THEN m.lps[i]
                         ELSE m.rps[i] END)) AS v
      FROM labeled l CROSS JOIN model m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN (v * 2 > {_N_TREES}) = (y = 1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN v IN (0, {_N_TREES}) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unanimous
    FROM votes
"""


@register("ml_random_forest_vote", _RF_ORACLE)
def ml_random_forest_vote(spark, sf_dir):
    """Bagged 5-stump ensemble (a random forest reduced to its
    relational essentials): each stump trains on a DETERMINISTIC
    md5-bootstrap (~2/3 of rows — first md5 byte of rid:tree mod 3),
    picks the accuracy-optimal `q <= t` split by EXACT integer argmax
    (correct = max(posL, negL) + max(posR, negR), a total
    (correct DESC, threshold) order — no Gini floats, unlike the
    single ml_decision_stump), and each row is scored by the
    majority of the 5 votes. Training is ONE per-q pass of 2x5
    CONDITIONAL aggregates (sum(when(in_bag_t, ...)) per tree) over
    the un-expanded base, unpivoted to the (tree, q) grid only after
    aggregation — since r9; the r1-r8 shape cross-joined the 5-row
    tree dimension first (5x row expansion through the hash-agg;
    tools/ab_forest.py: 3.13s -> 2.46s min at sf0.1, every
    interleaved rep pairwise faster, identical output — zero-count
    (t, q) rows are dropped post-unpivot to reproduce the exact
    candidate set, since a zero row would tie its cum-neighbor's
    score and could steal the argmax via the threshold tiebreak).
    No RNG anywhere, so the ensemble is reproducible across engines,
    runs and cluster sizes.
    Scale shape (r14 session 2): votes depend only on q, so the
    per-q table extended with the UNCONDITIONAL (count, sum(y)) pair
    is a sufficient statistic for inference too — n_correct is
    sum over q of (posq if the ensemble predicts 1 else nq - posq)
    and n_unanimous is sum(nq) over unanimous q. ONE conditional-
    aggregate scan collapses the facts to |distinct q| = 50 rows, a
    bounded collect brings them to the driver, and the stump argmax
    (exact integer `correct`, correct DESC / threshold ASC tiebreak,
    zero-count candidates skipped exactly like the post-unpivot
    filter) plus the vote rollup run in unbounded-int Python; the
    result returns as a literal 1-row frame. The r13 shape paid a
    second full lineitem scan for inference (broadcast model fold per
    row) — A/B at sf0.1: 1.738 s -> 0.842 s min over 5 interleaved
    reps, outputs identical (exact integers) at all three SFs.
    Everything in this entry is integer arithmetic, so the collapse
    is bit-safe by construction.
    Reference analog: the reference bags LightGBM/XGBoost
    (project/database_and_model_tools.py:126-164); this is the
    engine-native ensemble shape."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    # tree t's bootstrap byte = byte t of the ONE md5 per row (hex
    # positions 2t+1, 2t+2): 5x fewer hashes than md5(rid:t) per tree.
    # The 5 bytes are parsed ONCE per base row — conv() of the first 10
    # hex chars into a 40-bit BIGINT — and each tree's byte is a shift/
    # mask, instead of 2 instr+substr string ops per (row, tree)
    # membership test. Bit-identical to the hex math (verified over
    # all 6M sf0.1 rids; that r8 A/B measured 2.90s vs 3.27s min at
    # sf0.1 on the then-current expanded-grid shape); the DuckDB
    # oracle keeps the explicit hex arithmetic, so the equality is
    # cross-checked on every gate run.
    hashed = li.select(
        "q",
        "y",
        F.conv(
            F.substr(
                F.md5(F.concat(F.col("rid").cast("string"), F.lit(":bag"))),
                F.lit(1),
                F.lit(2 * _N_TREES),
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    )
    # hv packs _N_TREES bytes big-endian into a signed long; 7 bytes is
    # the capacity (8 flips the sign bit, and Java shiftright masks the
    # shift mod 64, so overshoot is silent wrong buckets, not an error).
    assert _N_TREES <= 7, "hv packs _N_TREES bytes into a signed long"
    # ONE pass: per-tree in-bag counts PLUS the unconditional (nq,
    # posq) pair that makes the 50-row table sufficient for inference
    # (see docstring). Bounded collect; everything after is exact
    # integer arithmetic on the driver.
    aggs = [
        F.count(F.lit(1)).cast("long").alias("nq"),
        F.sum("y").cast("long").alias("posq"),
    ]
    for t in range(_N_TREES):
        in_bag = (
            F.expr(f"shiftright(hv, ({_N_TREES - 1} - {t}) * 8) % 256") % 3
        ) != 0
        aggs.append(
            F.sum(F.when(in_bag, 1).otherwise(0)).cast("long").alias(f"n{t}")
        )
        aggs.append(
            F.sum(F.when(in_bag, F.col("y")).otherwise(0))
            .cast("long")
            .alias(f"pos{t}")
        )
    pvw_df = hashed.groupBy("q").agg(*aggs)
    rows = sorted(pvw_df.collect(), key=lambda r: r["q"])
    plancap.note(pvw_df)  # construction-time plan (no-op unless auditing)
    model = []  # per tree: (threshold, left_pred, right_pred)
    for t in range(_N_TREES):
        nt = sum(r[f"n{t}"] for r in rows)
        post = sum(r[f"pos{t}"] for r in rows)
        nl = 0
        posl = 0
        best = None  # (correct, threshold, left_pred, right_pred)
        for r in rows:
            nl += r[f"n{t}"]
            posl += r[f"pos{t}"]
            if r[f"n{t}"] <= 0:
                continue  # reproduce the expanded-grid candidate set
            correct = max(posl, nl - posl) + max(
                post - posl, (nt - nl) - (post - posl)
            )
            if best is None or correct > best[0] or (
                correct == best[0] and r["q"] < best[1]
            ):
                best = (
                    correct,
                    r["q"],
                    1 if posl * 2 >= nl else 0,
                    1 if (post - posl) * 2 >= (nt - nl) else 0,
                )
        model.append(best[1:])
    n_rows = n_correct = n_unanimous = 0
    for r in rows:
        q, nq, posq = r["q"], r["nq"], r["posq"]
        v = sum(lp if q <= th else rp for th, lp, rp in model)
        n_rows += nq
        n_correct += posq if v * 2 > _N_TREES else nq - posq
        if v in (0, _N_TREES):
            n_unanimous += nq
    return spark.range(1).select(
        F.lit(n_rows).cast("long").alias("n_rows"),
        F.lit(n_correct).cast("long").alias("n_correct"),
        F.lit(n_unanimous).cast("long").alias("n_unanimous"),
    )


_SNAPSHOTS = ["1996-01-01", "1997-01-01", "1998-01-01", "1999-01-01", "2000-01-01"]


@register(
    "ml_churn_labels_point_in_time",
    f"""
    WITH snaps AS (
      SELECT CAST(s AS DATE) AS snap
      FROM (SELECT unnest([{", ".join(f"'{s}'" for s in _SNAPSHOTS)}]) AS s)
    ),
    o AS (SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d FROM orders),
    feat AS (
      SELECT s.snap, o.cust,
             CAST(count(*) AS BIGINT) AS orders_90d_before
      FROM snaps s JOIN o
        ON date_diff('day', o.d, s.snap) > 0
       AND date_diff('day', o.d, s.snap) <= 90
      GROUP BY s.snap, o.cust
    ),
    lab AS (
      SELECT s.snap, o.cust, CAST(1 AS BIGINT) AS retained
      FROM snaps s JOIN o
        ON date_diff('day', s.snap, o.d) >= 0
       AND date_diff('day', s.snap, o.d) < 90
      GROUP BY s.snap, o.cust
    )
    SELECT CAST(f.snap AS DATE) AS snapshot_date,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN l.retained IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_churned,
           CAST(sum(CASE WHEN l.retained IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS churn_rate,
           CAST(sum(f.orders_90d_before) AS BIGINT) AS feature_order_mass
    FROM feat f LEFT JOIN lab l ON f.snap = l.snap AND f.cust = l.cust
    GROUP BY f.snap ORDER BY snapshot_date
    """,
)
def ml_churn_labels_point_in_time(spark, sf_dir):
    """Point-in-time-correct churn-label generation: for each snapshot
    date, the FEATURE window is the 90 days strictly before the
    snapshot and the LABEL window is the 90 days from it — no row can
    see its own future, the leakage discipline every training-data
    pipeline needs (and the reason SCD2 point-in-time joins exist —
    ext_scd2_point_in_time_join is the dimension-side twin). Windows
    are integer day-diff predicates (datediff here, date_diff in the
    oracle — both exact integer days); counts and the feature mass
    are exact; churn_rate is one division per snapshot. Scale: the
    snapshot grid is a 5-row broadcast against one orders scan; both
    aggregates are partial-aggregable on (snap, cust). Reference
    analog: none (training-label extension of ext_cohort_retention)."""
    snaps = spark.createDataFrame(
        [(s,) for s in _SNAPSHOTS], "snap_s string"
    ).select(F.col("snap_s").cast("date").alias("snap"))
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"), F.col("o_orderdate").cast("date").alias("d")
    )
    feat = (
        o.crossJoin(F.broadcast(snaps))
        .where(
            (F.datediff(F.col("snap"), F.col("d")) > 0)
            & (F.datediff(F.col("snap"), F.col("d")) <= 90)
        )
        .groupBy("snap", "cust")
        .agg(F.count("*").cast("long").alias("orders_90d_before"))
    )
    lab = (
        o.crossJoin(F.broadcast(snaps))
        .where(
            (F.datediff(F.col("d"), F.col("snap")) >= 0)
            & (F.datediff(F.col("d"), F.col("snap")) < 90)
        )
        .groupBy("snap", "cust")
        .agg(F.lit(1).cast("long").alias("retained"))
    )
    return (
        feat.join(lab, ["snap", "cust"], "left")
        .groupBy(F.col("snap").alias("snapshot_date"))
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum(F.when(F.col("retained").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_churned"),
            (
                F.sum(F.when(F.col("retained").isNull(), 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias("churn_rate"),
            F.sum("orders_90d_before").cast("long").alias("feature_order_mass"),
        )
        .orderBy("snapshot_date")
    )


@register(
    "ext_dynamic_partition_pruning",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
    GROUP BY 1 ORDER BY order_year
    """,
)
def ext_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning surface: the fact table is written
    partitioned by order year; the query joins it to a FILTERED tiny
    dim (selected years), and Spark's DPP turns the dim filter into a
    runtime partition skip on the fact scan — the mechanism that
    makes star-schema queries touch 2 of N partitions at 100 TB
    instead of all N (tests/test_plan_shapes.py asserts the
    dynamicpruning subquery in the physical plan). The oracle
    collapses to the equivalent static filter. The round trip runs in
    a scratch dir, result materialized before cleanup (the
    ext_source_text discipline)."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="dpp_")
    try:
        path = root + "/orders_by_year"
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_totalprice",
            "o_orderdate",
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        o.write.mode("overwrite").partitionBy("order_year").parquet(path)
        fact = spark.read.parquet(path)
        dim = (
            fact.select("order_year")
            .distinct()
            .where(F.col("order_year").isin(1997, 1998))
        )
        res = (
            fact.join(dim.hint("broadcast"), "order_year")
            .groupBy("order_year")
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
                .cast("long")
                .alias("total_cents"),
            )
            .orderBy("order_year")
        )
        rows = res.collect()
        return spark.createDataFrame(
            rows, "order_year bigint, n_orders bigint, total_cents bigint"
        ).orderBy("order_year")
    finally:
        shutil.rmtree(root, ignore_errors=True)
