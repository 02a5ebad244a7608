"""Sixteenth extension batch (round 6): the two VERDICT-r5-named
surfaces plus two iterative-analytics additions.

- `stream_foreach_batch_idempotent`: the exactly-once foreachBatch
  sink pattern (batchId-keyed dynamic-partition overwrite) the r5
  verdict named — the streaming counterpart of the reference's daily
  batch load (dags/db_pipeline_dag.py:45-77) made retry-safe: the
  entry REPLAYS a batch after the run and proves the table digest is
  unchanged, which `mode("append")` (stream_foreach_batch_sink's
  at-least-once cousin) cannot do.
- `ext_aqe_skew_join`: the hot-key fact-dim join WITHOUT a manual
  salt, relying on AQE's runtime skew split (the automatic complement
  to `ext_salted_join`'s explicit two-phase rewrite; the plan-level
  proof that skew=true splits fire lives in
  tests/test_plan_shapes.py::test_aqe_skew_join_split).
- `graph_label_propagation`: K=3 synchronous min-label propagation
  rounds over the sparse co-purchase graph (registry_ext9's edge
  builder) — the bounded-round community/component primitive whose
  unrolled-CTE oracle checks every intermediate frontier, unlike the
  run-to-convergence pointer jumping in llm/cluster.py.
- `ml_gbt_stumps`: two gradient-boosting rounds of depth-1 regression
  stumps with ALL-INTEGER training state (truncated-mean leaves,
  exact DECIMAL(38,0)/HUGEINT residual sums), extending
  ml_decision_stump's single split to the additive-ensemble shape of
  the reference's LightGBM family (M2) with bit-exact cross-engine
  trajectories.

Determinism contract: every learned quantity is an exact integer
(cents, counts, truncating integer division) or a double computed by
one fixed IEEE formula over exact integers — no rounding pins needed
anywhere in this batch."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import plancap
from .operators.ckpt import checkpoint_rotate, lazy_checkpoint, note_live
from .registry import _t, register
from .registry_ext9 import _COPURCHASE_EDGES_SQL, _copurchase_edges

_DEC = "decimal(38,0)"


# --- streaming: exactly-once idempotent foreachBatch sink -------------------


@register(
    "stream_foreach_batch_idempotent",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
    """,
)
def stream_foreach_batch_idempotent(spark, sf_dir):
    """Exactly-once foreachBatch sink: each micro-batch lands as a
    `batch_id=<n>` partition via dynamic-partition overwrite, so
    replaying a batch (sink succeeded, checkpoint commit lost — the
    standard failure window) REPLACES its own partition instead of
    appending duplicates. The entry simulates exactly that retry: after
    the availableNow drain it re-executes the writer for the last
    batch id with the same rows, then digests the table against the
    batch view of the source — equal digests prove idempotence (with
    mode("append") the replayed batch would double-count). Scale
    shape: the sink writes partition-local files, no shuffle; the
    idempotence key (batchId) is planner-provided, so retries are
    exactly-once regardless of executor failures mid-batch."""
    import os
    import shutil
    import tempfile

    from .session import tune_session
    from .streaming.windows import events_testdata_stream

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="stream_fb_idem_")
    try:
        table = f"{work}/t"

        def _write(batch, batch_id):
            (
                batch.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(table)
            )

        stream = events_testdata_stream(spark, sf_dir).select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        q = (
            stream.writeStream.foreachBatch(_write)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # retry simulation: re-run the writer for the last committed
        # batch with exactly the rows it already wrote
        last = max(
            int(d.split("=", 1)[1])
            for d in os.listdir(table)
            if d.startswith("batch_id=")
        )
        replay = spark.read.parquet(f"{table}/batch_id={last}")
        _write(replay, last)

        back = spark.read.parquet(table)
        out = back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        rows = out.collect()  # materialize before the scratch dir is removed
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- AQE runtime skew-join (the automatic complement of ext_salted_join) ----


@register(
    "ext_aqe_skew_join",
    """
    SELECT n_name, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM (SELECT CASE WHEN user_id % 25 < 22 THEN 0
                      ELSE user_id % 25 END AS k,
                 value
          FROM events) f
    JOIN nation ON f.k = n_nationkey
    GROUP BY n_name
    """,
)
def ext_aqe_skew_join(spark, sf_dir):
    """Hot-key join left to AQE's runtime skew split: ~88% of the fact
    rows share key 0, and instead of the manual salt+replicate rewrite
    (ext_salted_join) the merge-hinted sort-merge join relies on
    `spark.sql.adaptive.skewJoin` to split the oversized partition at
    runtime (dim rows are replicated to each split by AQE — the salt
    transform, applied automatically and only where the runtime stats
    demand it). At test SF the hot partition sits under the 256 MB
    default threshold, so the value here is the semantics row; the
    plan-level proof that the split fires under realistic sizes is
    tests/test_plan_shapes.py::test_aqe_skew_join_split. At 100 TB
    this entry's plan is exactly the one AQE rewrites."""
    e = _t(spark, sf_dir, "events")
    f = e.select(
        F.when(F.col("user_id") % 25 < 22, F.lit(0))
        .otherwise(F.col("user_id") % 25)
        .alias("k"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        f.join(n.hint("merge"), f.k == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast(_DEC)).cast("long").alias("sum_cents"),
        )
    )


# --- graph: K-round synchronous min-label propagation -----------------------


@register(
    "graph_label_propagation",
    f"""
    WITH {_COPURCHASE_EDGES_SQL},
    sym AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    l1 AS (SELECT t.node, min(t.l) AS lbl FROM (
             SELECT node, lbl AS l FROM l0
             UNION ALL
             SELECT e.u AS node, c.lbl AS l FROM sym e JOIN l0 c ON c.node = e.v
           ) t GROUP BY t.node),
    l2 AS (SELECT t.node, min(t.l) AS lbl FROM (
             SELECT node, lbl AS l FROM l1
             UNION ALL
             SELECT e.u AS node, c.lbl AS l FROM sym e JOIN l1 c ON c.node = e.v
           ) t GROUP BY t.node),
    l3 AS (SELECT t.node, min(t.l) AS lbl FROM (
             SELECT node, lbl AS l FROM l2
             UNION ALL
             SELECT e.u AS node, c.lbl AS l FROM sym e JOIN l2 c ON c.node = e.v
           ) t GROUP BY t.node)
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS size,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM l3 GROUP BY lbl
    """,
)
def graph_label_propagation(spark, sf_dir):
    """Synchronous min-label propagation, exactly 3 rounds, over the
    sparse co-purchase graph: label(v) starts as v and each round
    becomes min(own, neighbors') — the bounded-round community /
    connected-component primitive (3 rounds label everything within
    graph distance 3 of each component minimum). Fully deterministic
    with no tiebreak convention needed (min over a set), so the
    unrolled oracle checks every intermediate frontier bit-for-bit —
    the stricter cousin of llm/cluster.py's run-to-convergence pointer
    jumping, whose per-round step this validates. Scale shape: each
    round is one equi-join edge->labels plus a groupBy-min, both keyed
    on node — K rounds = K shuffles on the same key, and a real
    deployment reuses one hash partitioning across all rounds (the
    pointer-jumping doubling in cluster.py cuts the round count to
    log(diameter) when convergence, not a fixed budget, is the goal)."""
    # materialize the (linear-sized) edge list once — without this
    # every round's join replays the lineitem-orders pair-generation
    # (4x rebuild; bench: 4.1s -> this is the fix). r14 session 2:
    # the whole construction is now ONE eager job instead of four.
    # Every intermediate (edges, sym, rounds 0-1) is a LAZY
    # localCheckpoint — each caps the logical plan immediately, so no
    # round's plan nests an earlier round's — and the single eager
    # checkpoint of the FINAL round materializes the entire chain in
    # one job (upstream lazy-checkpoint blocks land as a side effect,
    # exactly the k-core 1-job/round discipline of registry_ext22).
    # A/B at sf0.1, 7 interleaved reps, identical outputs at
    # sf0.001/sf0.01: 4-job shape min 1.797 s vs fused 1.725 s (and
    # an intermediate 2-job variant was a wash at 1.794) — the win is
    # three saved scheduling round-trips; at 100 TB the materialized
    # bytes are identical and the blocks still retire on the
    # consumer's sweep (note_live contract, as graph_triangle_count).
    edges = lazy_checkpoint(
        _copurchase_edges(spark, sf_dir).select("u", "v")
    )
    sym = lazy_checkpoint(
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for i in range(3):
        neigh = sym.join(
            labels.withColumnRenamed("node", "v2").withColumnRenamed("lbl", "l"),
            F.col("v") == F.col("v2"),
        ).select(F.col("u").alias("node"), "l")
        labels = (
            labels.select("node", F.col("lbl").alias("l"))
            .union(neigh)
            .groupBy("node")
            .agg(F.min("l").alias("lbl"))
        )
        if i < 2:  # cap lineage between rounds (node-sized table); the
            # last round flows straight into the community rollup.
            labels = lazy_checkpoint(labels)
    # ONE eager job: materializes edges + sym + both intermediate
    # label rounds + the final round. The returned rollup reads only
    # the node-sized final checkpoint; every block id that appeared in
    # this job is recorded for the caller to retire after
    # materializing (bench's between-query sweep covers them too).
    labels, all_ids = checkpoint_rotate(labels)
    note_live(all_ids)
    return labels.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("size"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    ).select(
        F.col("lbl").alias("community"), "size", "min_node", "max_node"
    )


# --- SQL-native ML: gradient-boosted stumps (2 rounds, integer state) -------


def _fit_stump_exact(df):
    """Best depth-1 split of integer residual column `r` on integer
    feature `q`, with ALL-EXACT state: per-value sums in DECIMAL(38,0)
    (DuckDB mirrors with HUGEINT), the variance-reduction score
    s_l^2/n_l + s_r^2/n_r computed by one fixed IEEE formula over
    those exact integers (identical doubles cross-engine, so the
    argmax needs no rounding pin), and truncated-mean leaves via
    integer `div`. Returns a 1-row frame (t, w_lo, w_hi). The
    per-value table is referenced by both the total and the cumsum
    branch; Catalyst's ReuseExchange serves both from ONE shuffle of
    the data-sized aggregation (A/B-measured round 7: an explicit
    checkpoint of pv was 1.1x SLOWER — materialization overhead with
    no scan saved)."""
    pv = df.groupBy("q").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum(F.col("r").cast(_DEC)).alias("sv"),
    )
    tot = pv.agg(
        F.sum("nv").cast("long").alias("nt"),
        F.sum("sv").alias("st"),
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    cum = pv.select(
        "q",
        F.sum("nv").over(w).cast("long").alias("nl"),
        F.sum(F.col("sv")).over(w).alias("sl"),
    )
    cand = cum.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("nt"))
    sl = F.col("sl").cast("double")
    sr = (F.col("st") - F.col("sl")).cast("double")
    nl = F.col("nl")
    nr = F.col("nt") - F.col("nl")
    scored = cand.select(
        "q",
        "nl",
        "sl",
        nr.alias("nr"),
        (F.col("st") - F.col("sl")).alias("srx"),
        ((sl * sl) / nl + (sr * sr) / nr).alias("score"),
    )
    rk = Window.orderBy(F.col("score").desc(), F.col("q").asc())
    return (
        scored.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select(
            F.col("q").alias("t"),
            F.expr("sl div nl").alias("w_lo"),
            F.expr("srx div nr").alias("w_hi"),
        )
    )


@register(
    "ml_gbt_stumps",
    """
    WITH y AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ),
    t0 AS (SELECT count(*) AS n, sum(cents) AS s FROM y),
    base AS (SELECT CAST(s // n AS BIGINT) AS f0, CAST(n AS BIGINT) AS n FROM t0),
    r1 AS (SELECT q, cents - base.f0 AS r FROM y CROSS JOIN base),
    pv1 AS (SELECT q, count(*) AS nv, sum(r) AS sv FROM r1 GROUP BY q),
    tt1 AS (SELECT sum(nv) AS nt, sum(sv) AS st FROM pv1),
    cum1 AS (SELECT q, sum(nv) OVER w AS nl, sum(sv) OVER w AS sl FROM pv1
             WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)),
    sc1 AS (SELECT q, nl, sl, nt - nl AS nr, st - sl AS sr,
                   CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
                 + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE) / (nt - nl)
                     AS score
            FROM cum1 CROSS JOIN tt1 WHERE nl < nt),
    b1 AS (SELECT CAST(q AS BIGINT) AS t1,
                  CAST(sl // nl AS BIGINT) AS w1_lo,
                  CAST(sr // nr AS BIGINT) AS w1_hi
           FROM sc1 ORDER BY score DESC, q ASC LIMIT 1),
    r2 AS (SELECT q, r - CASE WHEN q <= b1.t1 THEN b1.w1_lo
                              ELSE b1.w1_hi END AS r
           FROM r1 CROSS JOIN b1),
    pv2 AS (SELECT q, count(*) AS nv, sum(r) AS sv FROM r2 GROUP BY q),
    tt2 AS (SELECT sum(nv) AS nt, sum(sv) AS st FROM pv2),
    cum2 AS (SELECT q, sum(nv) OVER w AS nl, sum(sv) OVER w AS sl FROM pv2
             WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)),
    sc2 AS (SELECT q, nl, sl, nt - nl AS nr, st - sl AS sr,
                   CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
                 + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE) / (nt - nl)
                     AS score
            FROM cum2 CROSS JOIN tt2 WHERE nl < nt),
    b2 AS (SELECT CAST(q AS BIGINT) AS t2,
                  CAST(sl // nl AS BIGINT) AS w2_lo,
                  CAST(sr // nr AS BIGINT) AS w2_hi
           FROM sc2 ORDER BY score DESC, q ASC LIMIT 1),
    r3 AS (SELECT r2.q, r2.r - CASE WHEN r2.q <= b2.t2 THEN b2.w2_lo
                                    ELSE b2.w2_hi END AS r
           FROM r2 CROSS JOIN b2),
    fin AS (SELECT sum(r * r) AS sse, count(*) AS n FROM r3)
    SELECT base.f0, b1.t1, b1.w1_lo, b1.w1_hi, b2.t2, b2.w2_lo, b2.w2_hi,
           CAST(fin.n AS BIGINT) AS n,
           CAST(fin.sse AS DOUBLE) / fin.n AS mse
    FROM base CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN fin
    """,
)
def ml_gbt_stumps(spark, sf_dir):
    """Gradient boosting, two rounds of depth-1 regression stumps
    (price-cents on quantity, squared loss): f0 = truncated global
    mean; each round fits the best variance-reduction split on the
    EXACT integer residuals and adds truncated-mean integer leaves —
    the additive-ensemble training loop of the reference's LightGBM
    family (project/database_and_model_tools.py M2) as pure relational
    algebra. The all-integer state (DECIMAL(38,0) sums, integer div
    leaves) makes both engines walk bit-identical trajectories with NO
    rounding pins: the only doubles are the split scores, computed by
    one fixed IEEE formula over exact integers, and the final MSE.
    Scale shape per round: one partial-aggregable groupBy collapses
    the facts to |distinct q| candidate rows (50 here; quantile-binned
    to 256 at 100 TB), the cumsum/argmax run on candidates only, and
    the 1-row stump comes back to the DRIVER as plain literals for the
    next round's expressions (the bounded-1-row-collect pattern of the
    k-core stats loop — model parameters, not data). The fully-lazy
    alternative (each stage a broadcast SUBPLAN re-embedded by every
    later stage and again by the final projection) was A/B-measured
    r9 at 1.98s vs 1.10s for this shape (tools/ab_gbt.py, interleaved
    min-of-reps): ReuseExchange does not dedupe the repeated parameter
    subtrees across broadcast boundaries, so the lazy tree re-derives
    early aggregates up to 4x. Residuals still never materialize —
    each round's scan derives them from literals in the same pass that
    aggregates the next fit (at 100 TB you cache the (q, cents)
    projection once across rounds)."""
    li = _t(spark, sf_dir, "lineitem")
    y = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    t0_df = y.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cents").cast(_DEC)).alias("s"),
    )
    t0 = t0_df.collect()[0]
    plancap.note(t0_df)  # construction-time plan (no-op unless auditing)
    f0 = int(t0["s"]) // int(t0["n"])  # trunc == floor: cents sums > 0
    r1 = y.select("q", (F.col("cents") - F.lit(f0)).alias("r"))
    b1_df = _fit_stump_exact(r1)
    b1 = b1_df.collect()[0]
    plancap.note(b1_df)
    t1, w1_lo, w1_hi = int(b1["t"]), int(b1["w_lo"]), int(b1["w_hi"])
    r2 = r1.select(
        "q",
        (
            F.col("r")
            - F.when(F.col("q") <= F.lit(t1), F.lit(w1_lo)).otherwise(
                F.lit(w1_hi)
            )
        ).alias("r"),
    )
    b2_df = _fit_stump_exact(r2)
    b2 = b2_df.collect()[0]
    plancap.note(b2_df)
    t2, w2_lo, w2_hi = int(b2["t"]), int(b2["w_lo"]), int(b2["w_hi"])
    r3 = r2.select(
        "q",
        (
            F.col("r")
            - F.when(F.col("q") <= F.lit(t2), F.lit(w2_lo)).otherwise(
                F.lit(w2_hi)
            )
        ).alias("r"),
    )
    fin = r3.agg(
        F.sum((F.col("r") * F.col("r")).cast(_DEC)).alias("sse"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return fin.select(
        F.lit(f0).cast("long").alias("f0"),
        F.lit(t1).cast("long").alias("t1"),
        F.lit(w1_lo).cast("long").alias("w1_lo"),
        F.lit(w1_hi).cast("long").alias("w1_hi"),
        F.lit(t2).cast("long").alias("t2"),
        F.lit(w2_lo).cast("long").alias("w2_lo"),
        F.lit(w2_hi).cast("long").alias("w2_hi"),
        "n",
        (F.col("sse").cast("double") / F.col("n")).alias("mse"),
    )
