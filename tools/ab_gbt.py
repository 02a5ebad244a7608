"""Isolated A/B for ml_gbt_stumps: the r1-r8 fully-lazy chain (one
action; correctness of its cost model rests on Catalyst's
ReuseExchange serving every repeated 1-row parameter subtree from one
execution) vs eager materialization of the per-round stump parameters.

The lazy plan embedded base/b1/b2 as broadcast SUBPLANS inside each
successive residual stage AND again in the final projection — 11
exchanges / 19 codegen spans for what is logically 4 scans of a
2-column projection. Measured r9 (this tool, interleaved min-of-reps
at sf0.1): lazy_chain 1.98s vs collect_literals 1.10s vs ckpt_params
1.61s — ReuseExchange does NOT dedupe across the broadcast boundaries,
the lazy tree re-derives early aggregates up to 4x. SHIPPED since r9:
collect_literals (the bounded-1-row-collect pattern of the k-core
stats loop — the collected rows are model parameters, not data);
`shipped` below calls the registry entry so the A/B keeps guarding
whatever is live.

Usage:
    python tools/ab_gbt.py [--sf /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_DEC = "decimal(38,0)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all
    from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext16  # noqa: F401
    from machine_telemetry_etl_ml_pipeline_spark.registry_ext16 import (
        _fit_stump_exact,
    )
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark
    from machine_telemetry_etl_ml_pipeline_spark.sources.catalog import load_table

    spark = get_spark("ab_gbt")
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(sf_dir: str):
        return REGISTRY["ml_gbt_stumps"].fn(spark, sf_dir)

    def lazy_chain(sf_dir: str):
        """The r1-r8 shape: every stage a lazy 1-row frame, re-embedded
        as a broadcast subplan by later stages and the final select."""
        y = _y(sf_dir)
        t0 = y.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("cents").cast(_DEC)).alias("s"),
        )
        base = t0.select(F.expr("s div n").alias("f0"), "n")
        r1 = y.crossJoin(F.broadcast(base)).select(
            "q", (F.col("cents") - F.col("f0")).alias("r")
        )
        b1 = _fit_stump_exact(r1).select(
            F.col("t").alias("t1"),
            F.col("w_lo").alias("w1_lo"),
            F.col("w_hi").alias("w1_hi"),
        )
        r2 = r1.crossJoin(F.broadcast(b1)).select(
            "q",
            (
                F.col("r")
                - F.when(F.col("q") <= F.col("t1"), F.col("w1_lo")).otherwise(
                    F.col("w1_hi")
                )
            ).alias("r"),
        )
        b2 = _fit_stump_exact(r2).select(
            F.col("t").alias("t2"),
            F.col("w_lo").alias("w2_lo"),
            F.col("w_hi").alias("w2_hi"),
        )
        r3 = r2.crossJoin(F.broadcast(b2)).select(
            "q",
            (
                F.col("r")
                - F.when(F.col("q") <= F.col("t2"), F.col("w2_lo")).otherwise(
                    F.col("w2_hi")
                )
            ).alias("r"),
        )
        fin = r3.agg(
            F.sum((F.col("r") * F.col("r")).cast(_DEC)).alias("sse"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        return (
            base.select("f0")
            .crossJoin(F.broadcast(b1))
            .crossJoin(F.broadcast(b2))
            .crossJoin(F.broadcast(fin))
            .select(
                "f0",
                "t1",
                "w1_lo",
                "w1_hi",
                "t2",
                "w2_lo",
                "w2_hi",
                "n",
                (F.col("sse").cast("double") / F.col("n")).alias("mse"),
            )
        )

    def _y(sf_dir: str):
        li = load_table(spark, sf_dir, "lineitem")
        return li.select(
            F.col("l_quantity").cast("long").alias("q"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
        )

    def collect_literals(sf_dir: str):
        """base/b1/b2 collected as driver literals; each boosting stage
        is then ONE clean scan with pure-literal arithmetic — 4 jobs,
        zero repeated subtrees, nothing for ReuseExchange to do."""
        y = _y(sf_dir)
        t0 = y.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("cents").cast(_DEC)).alias("s"),
        ).collect()[0]
        f0 = int(t0["s"]) // int(t0["n"])
        r1 = y.select("q", (F.col("cents") - F.lit(f0)).alias("r"))
        b1 = _fit_stump_exact(r1).collect()[0]
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
        b2 = _fit_stump_exact(r2).collect()[0]
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

    def ckpt_params(sf_dir: str):
        """base/b1/b2 localCheckpointed (1-row frames): lineage
        truncation forces each stage exactly once without the driver
        round-trip — the cluster-honest middle ground."""
        jsc = spark.sparkContext._jsc

        def _ids():
            return set(jsc.getPersistentRDDs().keySet().toArray())

        def _retire(ids):
            jmap = jsc.getPersistentRDDs()
            for rid in ids:
                r = jmap.get(rid)
                if r is not None:
                    r.unpersist(False)

        taken: set = set()

        def _ck(df):
            nonlocal taken
            before = _ids()
            out = df.localCheckpoint(eager=True)
            taken |= _ids() - before
            return out

        y = _y(sf_dir)
        base = _ck(
            y.agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("cents").cast(_DEC)).alias("s"),
            ).select(F.expr("s div n").alias("f0"), "n")
        )
        r1 = y.crossJoin(F.broadcast(base)).select(
            "q", (F.col("cents") - F.col("f0")).alias("r")
        )
        b1 = _ck(
            _fit_stump_exact(r1).select(
                F.col("t").alias("t1"),
                F.col("w_lo").alias("w1_lo"),
                F.col("w_hi").alias("w1_hi"),
            )
        )
        r2 = r1.crossJoin(F.broadcast(b1)).select(
            "q",
            (
                F.col("r")
                - F.when(F.col("q") <= F.col("t1"), F.col("w1_lo")).otherwise(
                    F.col("w1_hi")
                )
            ).alias("r"),
        )
        b2 = _ck(
            _fit_stump_exact(r2).select(
                F.col("t").alias("t2"),
                F.col("w_lo").alias("w2_lo"),
                F.col("w_hi").alias("w2_hi"),
            )
        )
        r3 = r2.crossJoin(F.broadcast(b2)).select(
            "q",
            (
                F.col("r")
                - F.when(F.col("q") <= F.col("t2"), F.col("w2_lo")).otherwise(
                    F.col("w2_hi")
                )
            ).alias("r"),
        )
        fin = r3.agg(
            F.sum((F.col("r") * F.col("r")).cast(_DEC)).alias("sse"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        out = (
            base.select("f0")
            .crossJoin(F.broadcast(b1))
            .crossJoin(F.broadcast(b2))
            .crossJoin(F.broadcast(fin))
            .select(
                "f0",
                "t1",
                "w1_lo",
                "w1_hi",
                "t2",
                "w2_lo",
                "w2_hi",
                "n",
                (F.col("sse").cast("double") / F.col("n")).alias("mse"),
            )
            .localCheckpoint(eager=True)
        )
        _retire(taken)
        return out

    variants = {
        "shipped": shipped,
        "lazy_chain": lazy_chain,
        "collect_literals": collect_literals,
        "ckpt_params": ckpt_params,
    }

    ref = None
    for name, fn in variants.items():
        got = tuple(map(tuple, fn("/root/testdata/sf0.01").collect()))
        if ref is None:
            ref = got
        elif got != ref:
            raise SystemExit(f"variant {name} output diverged:\n{got}\n!= {ref}")
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
