"""Isolated A/B for graph_label_propagation materialization strategy.

RESULT (negative — the shipped eager-checkpoint chain stays): with an
honest sweep (ckpt.unpersist_all now clears the SQL cache manager too,
see below) the persist-chain is ~1.9x SLOWER than the checkpoint chain
(4.53s vs 2.40s min at sf0.1). A lazy `persist()` is not a barrier
WITHIN a single action: the stages consuming the doubled labels
reference race the cache fill and recompute each round ~twice
(2^rounds evaluations), plus the columnar cache-encode cost. Eager
localCheckpoint forces each round exactly once. edges_ckpt_persist
(2.43s) and reuse_only (2.52s) tie the shipped shape within noise —
the per-round label checkpoints are nearly free because the frames are
node-sized.

MEASUREMENT TRAP this A/B uncovered: the first run of this tool showed
persist_chain "winning" at 1.89s — contaminated. The pre-fix
unpersist_all retired persistent-RDD BLOCKS but left CacheManager
ENTRIES alive, and Spark applies cached plans to ANY later query with
a matching subtree, so every variant after the first persist() call
(including the uncounted warm-up) was silently re-reading or
re-filling the previous variant's cache. ckpt.unpersist_all now calls
spark.catalog.clearCache() so cross-run plan matching cannot happen.

Variants:

- shipped: r8 shape — eager localCheckpoint for edges, sym, and rounds
  0-1 labels (4 eager jobs + the final action).
- persist_chain: every barrier is a lazy .persist(); single action
  materializes the whole chain, caches fill mid-job.
- edges_ckpt_persist: edge build eagerly checkpointed (the proven 4x
  rebuild fix), sym derived lazily from it, labels persisted lazily.
- reuse_only: edge build checkpointed, everything else raw lazy — prices
  ReuseExchange on the doubled per-round labels reference (the
  iterative-ML negative-result question asked of a graph loop).

Usage:  python tools/ab_labelprop.py [--sf /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_ROUNDS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import (
        checkpoint_rotate,
        unpersist_all,
    )
    from machine_telemetry_etl_ml_pipeline_spark.registry_ext9 import (
        _copurchase_edges,
    )
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_labelprop")
    spark.sparkContext.setLogLevel("ERROR")

    def _loop(sym, barrier):
        labels = sym.select(F.col("u").alias("node")).distinct().select(
            "node", F.col("node").alias("lbl")
        )
        for i in range(_ROUNDS):
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
            if i < _ROUNDS - 1:
                labels = barrier(labels)
        return labels.groupBy("lbl").agg(
            F.count(F.lit(1)).alias("size"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        ).select(
            F.col("lbl").alias("community"), "size", "min_node", "max_node"
        )

    def _sym_of(edges):
        return edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def shipped(sf_dir: str):
        edges, e_ids = checkpoint_rotate(
            _copurchase_edges(spark, sf_dir).select("u", "v")
        )
        sym, _ = checkpoint_rotate(_sym_of(edges), retire=e_ids)
        return _loop(sym, lambda df: checkpoint_rotate(df)[0])

    def persist_chain(sf_dir: str):
        edges = _copurchase_edges(spark, sf_dir).select("u", "v").persist()
        sym = _sym_of(edges).persist()
        return _loop(sym, lambda df: df.persist())

    def edges_ckpt_persist(sf_dir: str):
        edges, _ = checkpoint_rotate(
            _copurchase_edges(spark, sf_dir).select("u", "v")
        )
        return _loop(_sym_of(edges), lambda df: df.persist())

    def reuse_only(sf_dir: str):
        edges, _ = checkpoint_rotate(
            _copurchase_edges(spark, sf_dir).select("u", "v")
        )
        return _loop(_sym_of(edges), lambda df: df)

    variants = {
        "shipped": shipped,
        "persist_chain": persist_chain,
        "edges_ckpt_persist": edges_ckpt_persist,
        "reuse_only": reuse_only,
    }

    ref = None
    for name, fn in variants.items():
        got = sorted(map(tuple, fn("/root/testdata/sf0.01").collect()))
        if ref is None:
            ref = got
        elif got != ref:
            raise SystemExit(f"variant {name} output diverged ({len(got)} rows)")
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
        reps = ", ".join(f"{t:.2f}" for t in times[name])
        print(f"{name}: min={best[name]:.2f}s  reps=[{reps}]")


if __name__ == "__main__":
    main()
