"""Isolated A/B for ml_gmm_em_1d: shipped lazy parameter-chain vs
collecting each EM round's 1-row parameter frame as driver literals.

Context: the r9 gbt-stumps A/B showed ReuseExchange does not dedupe
1-row parameter subtrees nested inside different broadcast builds, so
a lazy frame embedded at multiplicity >= 2 re-derives its whole chain
(gbt -45%, logistic -28%, naive-bayes null — SCALE.md multiplicity
doctrine). GMM-EM's structure is the strongest remaining instance:
round i's E-step cross-joins the round i-1 parameter aggregate, whose
plan embeds rounds 0..i-2 AND the `stats` standardization aggregate —
the final projection therefore nests the orders scan ~5 deep across
broadcast-build boundaries. The collected values are the 1e-9-rounded
trajectory doubles, so the literal variant walks the IDENTICAL path
(identity pre-check enforces it).

Usage:
    python tools/ab_gmm.py [--sf /root/testdata/sf0.1] [--reps 3]
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
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext22  # noqa: F401
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_gmm")
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(sf_dir: str):
        return REGISTRY["ml_gmm_em_1d"].fn(spark, sf_dir)

    def collect_literals(sf_dir: str):
        cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        orders = _t(spark, sf_dir, "orders")
        st = (
            orders.select(cents.alias("p"))
            .agg(
                F.round(F.avg("p"), 9).alias("m"),
                F.round(F.stddev_pop("p"), 9).alias("s"),
                F.count("*").cast("double").alias("n"),
            )
            .collect()[0]
        )
        m, s, n = float(st["m"]), float(st["s"]), float(st["n"])
        d = orders.select(((cents - F.lit(m)) / F.lit(s)).alias("x"))
        wgt, mu1, v1, mu2, v2 = 0.5, -1.0, 1.0, 1.0, 1.0
        for _ in range(3):
            x = F.col("x")
            p1 = (
                F.lit(wgt)
                * F.exp(-(x - F.lit(mu1)) * (x - F.lit(mu1)) / (2 * F.lit(v1)))
                / F.sqrt(F.lit(v1))
            )
            p2 = (
                (1 - F.lit(wgt))
                * F.exp(-(x - F.lit(mu2)) * (x - F.lit(mu2)) / (2 * F.lit(v2)))
                / F.sqrt(F.lit(v2))
            )
            r = (p1 / (p1 + p2)).alias("r")
            row = (
                d.select(r, x.alias("x"))
                .agg(
                    F.round(F.sum("r") / F.lit(n), 9).alias("wgt"),
                    F.round(F.sum(F.col("r") * F.col("x")) / F.sum("r"), 9).alias(
                        "mu1"
                    ),
                    F.round(
                        F.sum(F.col("r") * F.col("x") * F.col("x")) / F.sum("r")
                        - (F.sum(F.col("r") * F.col("x")) / F.sum("r"))
                        * (F.sum(F.col("r") * F.col("x")) / F.sum("r")),
                        9,
                    ).alias("v1"),
                    F.round(
                        F.sum((1 - F.col("r")) * F.col("x"))
                        / F.sum(F.lit(1) - F.col("r")),
                        9,
                    ).alias("mu2"),
                    F.round(
                        F.sum((1 - F.col("r")) * F.col("x") * F.col("x"))
                        / F.sum(F.lit(1) - F.col("r"))
                        - (
                            F.sum((1 - F.col("r")) * F.col("x"))
                            / F.sum(F.lit(1) - F.col("r"))
                        )
                        * (
                            F.sum((1 - F.col("r")) * F.col("x"))
                            / F.sum(F.lit(1) - F.col("r"))
                        ),
                        9,
                    ).alias("v2"),
                )
                .collect()[0]
            )
            wgt, mu1, v1, mu2, v2 = (
                float(row["wgt"]),
                float(row["mu1"]),
                float(row["v1"]),
                float(row["mu2"]),
                float(row["v2"]),
            )
        zero = F.lit(0.0)
        return spark.range(1).select(
            (F.round(F.lit(wgt), 6) + zero).alias("weight1"),
            (F.round(F.lit(mu1), 6) + zero).alias("mu1"),
            (F.round(F.lit(v1), 6) + zero).alias("var1"),
            (F.round(F.lit(mu2), 6) + zero).alias("mu2"),
            (F.round(F.lit(v2), 6) + zero).alias("var2"),
            F.lit(int(n)).cast("long").alias("n_rows"),
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
        if name not in best:
            continue  # --reps 0: identity pre-check only
        reps = ", ".join(f"{t:.2f}" for t in times[name])
        print(f"{name}: min={best[name]:.2f}s  reps=[{reps}]")


if __name__ == "__main__":
    main()
