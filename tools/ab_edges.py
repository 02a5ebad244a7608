"""Isolated A/B for the SHARED co-purchase edge build
(registry_ext9._copurchase_edges — feeds triangle/BFS/k-core/
label-prop/clustering-coef/assortativity/common-neighbors).

old: distinct(cust, part, wk) -> self-join on (part, wk) with
     cust< cust -> distinct(u, v): 3 exchanges + a join whose both
     sides re-derive grp (ReuseExchange usually saves one).
set_pairs: groupBy(part, wk).collect_set(cust) -> in-array ordered
     pair expansion -> distinct(u, v): 2 exchanges, NO join. Safe
     because group sizes are bounded by per-(part, week) buyer counts
     (max 4, avg 1.04 at sf0.1 — measured; 95% singleton groups emit
     nothing), so the in-group quadratic is the same pair count the
     join produced. collect_set's arrival order is nondeterministic
     but the pair SET is order-free (sort_array before expansion) and
     the final distinct seals it.

Timed through graph_triangle_count's counting stage (the most
edge-build-dominated entry) so the A/B measures the build in situ.

Usage:
    python tools/ab_edges.py [--sf /root/testdata/sf0.1] [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import (
        checkpoint_rotate,
        unpersist_all,
    )
    from machine_telemetry_etl_ml_pipeline_spark.registry import _t
    from machine_telemetry_etl_ml_pipeline_spark.registry_ext9 import (
        count_triangles,
    )
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_edges")
    spark.sparkContext.setLogLevel("ERROR")

    def _base(sf_dir: str):
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_partkey",
            F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
        )
        orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
            "wk",
        )

    def edges_old(sf_dir: str):
        grp = _base(sf_dir).distinct()
        a, b = grp.alias("a"), grp.alias("b")
        return (
            a.join(
                b,
                (F.col("a.part") == F.col("b.part"))
                & (F.col("a.wk") == F.col("b.wk"))
                & (F.col("a.cust") < F.col("b.cust")),
            )
            .select(F.col("a.cust").alias("u"), F.col("b.cust").alias("v"))
            .distinct()
        )

    def edges_set_pairs(sf_dir: str):
        sets = (
            _base(sf_dir)
            .groupBy("part", "wk")
            .agg(F.sort_array(F.collect_set("cust")).alias("cs"))
            .where(F.size("cs") >= 2)
        )
        pairs = F.flatten(
            F.transform(
                F.col("cs"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("cs"), i + F.lit(2), F.size(F.col("cs"))
                    ),
                    lambda y: F.struct(x.alias("u"), y.alias("v")),
                ),
            )
        )
        return (
            sets.select(F.explode(pairs).alias("p"))
            .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
            .distinct()
        )

    def tri_old(sf_dir: str):
        e, _ids = checkpoint_rotate(edges_old(sf_dir))
        return count_triangles(e)

    def tri_set_pairs(sf_dir: str):
        e, _ids = checkpoint_rotate(edges_set_pairs(sf_dir))
        return count_triangles(e)

    variants = {
        "old": tri_old,
        "set_pairs": tri_set_pairs,
    }

    ref = None
    for name, fn in variants.items():
        got = tuple(map(tuple, fn("/root/testdata/sf0.01").collect()))
        if ref is None:
            ref = got
        elif got != ref:
            raise SystemExit(f"variant {name} output diverged:\n{got}\n!= {ref}")
        unpersist_all(spark)
    print(f"outputs identical at sf0.01 ({ref})")
    # edge-SET identity (not just triangle counts) at sf0.01
    eo = set(map(tuple, edges_old("/root/testdata/sf0.01").collect()))
    en = set(map(tuple, edges_set_pairs("/root/testdata/sf0.01").collect()))
    if eo != en:
        raise SystemExit(
            f"edge sets differ: {len(eo - en)} only-old, {len(en - eo)} only-new"
        )
    unpersist_all(spark)
    print(f"edge sets identical at sf0.01 ({len(eo)} edges)")

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
