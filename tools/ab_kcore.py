"""Isolated A/B for graph_k_core: per-round deg CHECKPOINT (shipped)
vs deg PERSIST vs deg recompute. Same harness discipline as
ab_triangle.py (fresh tuned session, warm-up, N interleaved reps,
block-manager sweep between runs, min-of-reps).

Why these variants: the shipped loop runs 3 jobs per round
(deg checkpoint, 1-row stats collect, edge checkpoint). deg's lineage
is one groupBy above an already-checkpointed edge list, so a plain
`persist()` gives the same single-evaluation sharing between the
stats collect and the survivor semi-join at 2 jobs per round — the
eager checkpoint job disappears and the stats collect materializes
the cache as a side effect. The recompute variant drops deg
materialization entirely (the semi-join re-derives the groupBy inside
the edge-checkpoint job) to price the cache itself.

Usage:

    python tools/ab_kcore.py [--sf /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_K = 2
_PEEL_ROUNDS = 6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--variants",
        default="",
        help="comma-separated subset of variant names to run (default all)",
    )
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import (
        checkpoint_rotate,
        retire_ids,
        unpersist_all,
    )
    from machine_telemetry_etl_ml_pipeline_spark.registry_ext9 import (
        _copurchase_edges,
    )
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_kcore")
    spark.sparkContext.setLogLevel("ERROR")

    def _deg(e):
        return (
            e.select(F.col("u").alias("node"))
            .union(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("c"))
        )

    def _peel(e, keep):
        return (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
        )

    def shipped(sf_dir: str):
        """r7/r8 shape: deg checkpointed per round (3 jobs/round)."""
        e, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir).select("u", "v"))
        rows = []
        deg_ids: list = []
        for i in range(_PEEL_ROUNDS + 1):
            deg, deg_ids = checkpoint_rotate(_deg(e), retire=deg_ids)
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            e, e_ids = checkpoint_rotate(_peel(e, keep), retire=e_ids)
        retire_ids(spark, e_ids + deg_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def persist_deg(sf_dir: str):
        """deg persisted per round: the stats collect materializes the
        cache, the survivor semi-join reuses it (2 jobs/round)."""
        e, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir).select("u", "v"))
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e).persist()
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                deg.unpersist(False)
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            e, e_ids = checkpoint_rotate(_peel(e, keep), retire=e_ids)
            deg.unpersist(False)
        retire_ids(spark, e_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def recompute_deg(sf_dir: str):
        """deg never materialized: the semi-join re-derives the groupBy
        inside the edge-checkpoint job (2 jobs/round, one extra 2|E|
        aggregate per round)."""
        e, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir).select("u", "v"))
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e)
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            e, e_ids = checkpoint_rotate(_peel(e, keep), retire=e_ids)
        retire_ids(spark, e_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    # A per-round .persist() on the EDGE list instead of localCheckpoint
    # was tried and is NOT viable: persist caps EXECUTION
    # (InMemoryRelation substitution at physical planning) but not the
    # LOGICAL tree, and each peel round references e three times (deg's
    # union twice + the semi-join probe), so the analyzed plan grows
    # 3^rounds copies of the base build — 729x at 6 rounds. Catalyst
    # analysis + plan stringification on that tree OOMs the driver heap
    # before the first job launches. Checkpoint's lineage TRUNCATION is
    # what keeps iterative loops with multiplicative self-reference
    # bounded; a persist chain is only safe when multiplicity^rounds
    # stays small (graph_label_propagation: 2^3).

    def lazy_ckpt_fused(sf_dir: str):
        """localCheckpoint(eager=False) on each round's edge list: the
        round's stats collect materializes the checkpoint in the SAME
        job (lineage still truncates on materialization), halving the
        job count — 7 collects total instead of 7 collects + 7 eager
        checkpoint jobs. Id attribution diffs the persistent-RDD set
        around the collect (blocks appear at materialization, not at
        the localCheckpoint call); the previous round's blocks retire
        only after the new round's blocks are live."""
        jsc = spark.sparkContext._jsc

        def _ids():
            return set(jsc.getPersistentRDDs().keySet().toArray())

        def _retire(ids):
            jmap = jsc.getPersistentRDDs()
            for rid in ids:
                r = jmap.get(rid)
                if r is not None:
                    r.unpersist(False)

        e = (
            _copurchase_edges(spark, sf_dir)
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        prev_ids: set = set()
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e)
            before = _ids()
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            new_ids = _ids() - before  # e's blocks, live as of this job
            _retire(prev_ids)
            prev_ids = new_ids
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                _retire(prev_ids)
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            e = _peel(e, keep).localCheckpoint(eager=False)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def _peel_anti(e, bad, hint: bool):
        b_u = bad.withColumnRenamed("node", "u")
        b_v = bad.withColumnRenamed("node", "v")
        if hint:
            b_u, b_v = F.broadcast(b_u), F.broadcast(b_v)
        return (
            e.join(b_u, "u", "left_anti").join(b_v, "v", "left_anti").select("u", "v")
        )

    def _anti_bad(sf_dir: str, hint: bool):
        """r9 candidate: keep the r8 recompute-deg discipline but apply
        the survivor filter as two anti-joins on the DROPPED node set
        (deg < k) instead of two semi-joins on the kept set. Peeling
        keeps the dropped set small and shrinking, so the anti build
        side is broadcast-able — the edge list is never shuffled and
        each round's only exchange is deg's groupBy. `hint` forces the
        broadcast; hint-free lets AQE flip to broadcast from the deg
        shuffle's runtime stats (the shape that also holds at cluster
        scale, where round-0's dropped set might not fit a hint)."""
        e, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir).select("u", "v"))
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e)
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                break
            bad = deg.where(F.col("c") < _K).select("node")
            e, e_ids = checkpoint_rotate(_peel_anti(e, bad, hint), retire=e_ids)
        retire_ids(spark, e_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def anti_bad_aqe(sf_dir: str):
        return _anti_bad(sf_dir, hint=False)

    def anti_bad_hint(sf_dir: str):
        return _anti_bad(sf_dir, hint=True)

    def sym_partitioned(sf_dir: str):
        """r9 candidate 2: ZERO data-sized exchanges per round. The
        loop state is the SYMMETRIZED list (node, other), checkpointed
        hash-partitioned on node — localCheckpoint captures the
        physical outputPartitioning into LogicalRDD, BUT ONLY with AQE
        OFF during the checkpoint call (under AQE the captured plan is
        AdaptiveSparkPlanExec and the partitioning degrades to
        UnknownPartitioning — probed on this build). With the
        partitioning captured, deg's groupBy(node) needs NO exchange
        (EnsureRequirements sees the source already satisfies the
        distribution), the survivor filter is two broadcast semi-joins
        (node side map-local, other side broadcast), and filters
        preserve the partitioning into the NEXT round's checkpoint —
        so after the one up-front repartition the peel never shuffles
        the edge list OR the degree table again. Costs: 2x checkpoint
        bytes per round (sym is 2|E|), and the AQE toggle around each
        checkpoint call."""
        jsc = spark.sparkContext._jsc

        def _ids():
            return set(jsc.getPersistentRDDs().keySet().toArray())

        def _retire(ids):
            jmap = jsc.getPersistentRDDs()
            for rid in ids:
                r = jmap.get(rid)
                if r is not None:
                    r.unpersist(False)

        def _ckpt_noaqe(df):
            before = _ids()
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                out = df.localCheckpoint(eager=True)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            return out, list(_ids() - before)

        e = _copurchase_edges(spark, sf_dir).select("u", "v")
        sym, s_ids = _ckpt_noaqe(
            e.select(F.col("u").alias("node"), F.col("v").alias("other"))
            .union(e.select(F.col("v").alias("node"), F.col("u").alias("other")))
            .repartition(32, "node")
        )
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = sym.groupBy("node").agg(F.count("*").alias("c"))
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            nxt = (
                sym.join(
                    F.broadcast(keep.withColumnRenamed("node", "n1")),
                    F.col("node") == F.col("n1"),
                    "left_semi",
                )
                .join(
                    F.broadcast(keep.withColumnRenamed("node", "n2")),
                    F.col("other") == F.col("n2"),
                    "left_semi",
                )
                .select("node", "other")
            )
            sym, new_ids = _ckpt_noaqe(nxt)
            _retire(s_ids)
            s_ids = new_ids
        _retire(s_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def early_exit(sf_dir: str):
        """recompute_deg + monotone fixpoint break: the peel only ever
        REMOVES edges, so if round i's (n_nodes, n_edges) equals round
        i-1's, the survivor set is literally unchanged (subset with
        equal cardinality) and every later round's stats are identical
        — fill them driver-side and stop running jobs. The test is
        FREE: the per-round 1-row stats collect is already the entry's
        output. Output is bit-identical (all PEEL_ROUNDS+1 rows still
        emitted)."""
        e, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir).select("u", "v"))
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e)
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                break
            if i > 0 and rows[i][1:] == rows[i - 1][1:]:
                rows.extend(
                    (j, rows[i][1], rows[i][2])
                    for j in range(i + 1, _PEEL_ROUNDS + 1)
                )
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            e, e_ids = checkpoint_rotate(_peel(e, keep), retire=e_ids)
        retire_ids(spark, e_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def fold2x(sf_dir: str):
        """r10 candidate (the last obvious mechanism, VERDICT r9 item
        6): fold degree-compute + BOTH endpoint filters into a
        2-exchange, ZERO-JOIN round. Pass 1: per-node degree via a
        count() window over the symmetrized (node, other) list
        partitioned by node (no aggregation collapse, no adjacency
        arrays — hub-safe, windows spill), filter deg >= k in place.
        Pass 2: group the surviving DIRECTED rows by the canonical
        (least, greatest) pair — an undirected edge whose BOTH
        endpoints were kept appears exactly twice (once from each
        endpoint's directed row), one kept endpoint appears once — so
        count = 2 IS the both-endpoints-kept test, no keep-set join at
        all. The shape never broadcasts and never shuffles a build
        side: at cluster scale it holds even when round-0's keep set
        is too big for a broadcast (the semi-join shapes degrade to
        shuffle joins there = 3 exchanges of the edge list). Early
        exit + recompute-deg stats discipline identical to shipped."""
        from pyspark.sql.window import Window

        e, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir).select("u", "v"))
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e)
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                break
            if i > 0 and rows[i][1:] == rows[i - 1][1:]:
                rows.extend(
                    (j, rows[i][1], rows[i][2])
                    for j in range(i + 1, _PEEL_ROUNDS + 1)
                )
                break
            directed = e.select(F.col("u").alias("node"), F.col("v").alias("other")).union(
                e.select(F.col("v").alias("node"), F.col("u").alias("other"))
            )
            kept = directed.withColumn(
                "c", F.count("*").over(Window.partitionBy("node"))
            ).where(F.col("c") >= _K)
            nxt = (
                kept.groupBy(
                    F.least("node", "other").alias("u"),
                    F.greatest("node", "other").alias("v"),
                )
                .agg(F.count("*").alias("n2"))
                .where(F.col("n2") == 2)
                .select("u", "v")
            )
            e, e_ids = checkpoint_rotate(nxt, retire=e_ids)
        retire_ids(spark, e_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def _peel_reuse(e, keep):
        """Semi-joins via join CONDITION on the un-renamed keep frame:
        withColumnRenamed puts a distinct Project under each
        BroadcastExchange, so the two builds plan as DIFFERENT
        exchanges and deg's groupBy runs twice inside the edge-
        checkpoint job. Joining on e.u == keep.node keeps both
        broadcast subtrees canonically identical -> ReusedExchange,
        one deg evaluation for both endpoint filters."""
        k1, k2 = keep.alias("k1"), keep.alias("k2")
        return (
            e.join(k1, F.col("u") == F.col("k1.node"), "left_semi")
            .join(k2, F.col("v") == F.col("k2.node"), "left_semi")
            .select("u", "v")
        )

    def _early_loop(sf_dir: str, peel):
        """shipped discipline (recompute deg, eager ckpt, early exit)
        parameterized over the peel shape."""
        e, e_ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir).select("u", "v"))
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e)
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                break
            if i > 0 and rows[i][1:] == rows[i - 1][1:]:
                rows.extend(
                    (j, rows[i][1], rows[i][2])
                    for j in range(i + 1, _PEEL_ROUNDS + 1)
                )
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            e, e_ids = checkpoint_rotate(peel(e, keep), retire=e_ids)
        retire_ids(spark, e_ids)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def semi_reuse_early(sf_dir: str):
        return _early_loop(sf_dir, _peel_reuse)

    def _fused_loop(sf_dir: str, peel):
        """lazy_ckpt_fused discipline (stats collect materializes the
        round's checkpoint in the SAME job) + early exit, parameterized
        over the peel shape."""
        jsc = spark.sparkContext._jsc

        def _ids():
            return set(jsc.getPersistentRDDs().keySet().toArray())

        def _retire(ids):
            jmap = jsc.getPersistentRDDs()
            for rid in ids:
                r = jmap.get(rid)
                if r is not None:
                    r.unpersist(False)

        e = (
            _copurchase_edges(spark, sf_dir)
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        prev_ids: set = set()
        rows = []
        for i in range(_PEEL_ROUNDS + 1):
            deg = _deg(e)
            before = _ids()
            st = deg.agg(
                F.count("*").alias("n_nodes"), F.sum("c").alias("cnt2")
            ).collect()[0]
            new_ids = _ids() - before
            _retire(prev_ids)
            prev_ids = new_ids
            rows.append((i, int(st["n_nodes"]), int(st["cnt2"] or 0) // 2))
            if i == _PEEL_ROUNDS:
                _retire(prev_ids)
                break
            if i > 0 and rows[i][1:] == rows[i - 1][1:]:
                rows.extend(
                    (j, rows[i][1], rows[i][2])
                    for j in range(i + 1, _PEEL_ROUNDS + 1)
                )
                _retire(prev_ids)
                break
            keep = deg.where(F.col("c") >= _K).select("node")
            e = peel(e, keep).localCheckpoint(eager=False)
        return spark.createDataFrame(
            rows, "peel_round long, n_nodes long, n_edges long"
        ).orderBy("peel_round")

    def fused_early(sf_dir: str):
        return _fused_loop(sf_dir, _peel)

    def fused_reuse_early(sf_dir: str):
        return _fused_loop(sf_dir, _peel_reuse)

    variants = {
        "shipped": shipped,
        "persist_deg": persist_deg,
        "recompute_deg": recompute_deg,
        "lazy_ckpt_fused": lazy_ckpt_fused,
        "anti_bad_aqe": anti_bad_aqe,
        "anti_bad_hint": anti_bad_hint,
        "sym_partitioned": sym_partitioned,
        "early_exit": early_exit,
        "fold2x": fold2x,
        "semi_reuse_early": semi_reuse_early,
        "fused_early": fused_early,
        "fused_reuse_early": fused_reuse_early,
    }
    if args.variants:
        wanted = args.variants.split(",")
        missing = [n for n in wanted if n not in variants]
        if missing:
            raise SystemExit(f"unknown variants: {missing}")
        variants = {n: variants[n] for n in wanted}

    # cross-variant output identity check (cheap SF) before timing
    ref = None
    for name, fn in variants.items():
        got = tuple(map(tuple, fn("/root/testdata/sf0.01").collect()))
        if ref is None:
            ref = got
        elif got != ref:
            raise SystemExit(f"variant {name} output diverged: {got} != {ref}")
    unpersist_all(spark)
    print(f"outputs identical at sf0.01 ({len(ref)} rows)")

    def run_once(fn) -> float:
        t0 = time.time()
        fn(args.sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        unpersist_all(spark)
        return dt

    for fn in variants.values():
        run_once(fn)

    best: dict[str, float] = {}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.reps):
        for name, fn in variants.items():
            t = run_once(fn)
            times[name].append(t)
            if name not in best or t < best[name]:
                best[name] = t
    for name in variants:
        if name not in best:
            continue  # --reps 0: identity pre-check only
        reps = ", ".join(f"{t:.2f}" for t in times[name])
        print(f"{name}: min={best[name]:.2f}s  reps=[{reps}]")


if __name__ == "__main__":
    main()
