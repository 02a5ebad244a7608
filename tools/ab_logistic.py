"""Isolated A/B for ml_logistic_regression_gd: shipped lazy
weight-chain vs collecting each step's 1-row weight vector as driver
literals.

Context: the r7 A/B justified the lazy chain against an explicit
per-step CHECKPOINT (checkpoint was 1.2x slower — eager job overhead).
The r9 gbt-stumps A/B then showed the third option wins there:
ReuseExchange does not dedupe 1-row parameter subtrees nested inside
different broadcast builds, so a lazy frame embedded at multiplicity
>= 2 re-derives its whole chain. Logistic's multiplicity is lower than
gbt's (each step's gradient embeds the weights once; only the FINAL
projection uses w twice — once for the weight columns, once inside the
accuracy scan), so the expected win is smaller — this A/B prices it.
The collected values are the 1e-9-rounded trajectory doubles, so the
literal variant walks the IDENTICAL path (identity pre-check enforces
it).

Usage:
    python tools/ab_logistic.py [--sf /root/testdata/sf0.1] [--reps 3]
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all
    from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY, _t
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext9  # noqa: F401
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_logistic")
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(sf_dir: str):
        return REGISTRY["ml_logistic_regression_gd"].fn(spark, sf_dir)

    def collect_literals(sf_dir: str):
        li = _t(spark, sf_dir, "lineitem")
        st = li.agg(
            F.round(F.avg("l_quantity"), 9).alias("m1"),
            F.round(F.stddev_pop("l_quantity"), 9).alias("s1"),
            F.round(F.avg("l_discount"), 9).alias("m2"),
            F.round(F.stddev_pop("l_discount"), 9).alias("s2"),
            F.count("*").cast("double").alias("n"),
        ).collect()[0]
        n = float(st["n"])
        d = li.select(
            F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
            ((F.col("l_quantity") - F.lit(float(st["m1"]))) / F.lit(float(st["s1"]))).alias("x1"),
            ((F.col("l_discount") - F.lit(float(st["m2"]))) / F.lit(float(st["s2"]))).alias("x2"),
        )
        g = d.agg(
            F.round(F.sum(F.lit(0.5) - F.col("y")) / F.lit(n), 9).alias("g0"),
            F.round(F.sum((F.lit(0.5) - F.col("y")) * F.col("x1")) / F.lit(n), 9).alias("ga"),
            F.round(F.sum((F.lit(0.5) - F.col("y")) * F.col("x2")) / F.lit(n), 9).alias("gb"),
        ).collect()[0]
        w0, wa, wb = -0.5 * g["g0"], -0.5 * g["ga"], -0.5 * g["gb"]
        for _ in range(2):
            z = F.lit(w0) + F.lit(wa) * F.col("x1") + F.lit(wb) * F.col("x2")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            g = d.agg(
                F.round(F.sum(p - F.col("y")) / F.lit(n), 9).alias("g0"),
                F.round(F.sum((p - F.col("y")) * F.col("x1")) / F.lit(n), 9).alias("ga"),
                F.round(F.sum((p - F.col("y")) * F.col("x2")) / F.lit(n), 9).alias("gb"),
            ).collect()[0]
            w0, wa, wb = w0 - 0.5 * g["g0"], wa - 0.5 * g["ga"], wb - 0.5 * g["gb"]
        z = F.lit(w0) + F.lit(wa) * F.col("x1") + F.lit(wb) * F.col("x2")
        pred_y = F.when(F.round(z, 9) > 0, 1.0).otherwise(0.0)
        pred = d.agg(
            F.sum(F.when(pred_y == F.col("y"), 1).otherwise(0)).cast("long").alias("n_correct"),
            F.count("*").cast("long").alias("n_rows"),
        )
        zero = F.lit(0.0)
        return pred.select(
            (F.round(F.lit(w0), 6) + zero).alias("w_intercept"),
            (F.round(F.lit(wa), 6) + zero).alias("w_qty"),
            (F.round(F.lit(wb), 6) + zero).alias("w_disc"),
            "n_correct",
            "n_rows",
        )

    variants = {
        "shipped": shipped,
        "collect_literals": collect_literals,
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
