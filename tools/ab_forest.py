"""Isolated A/B for ml_random_forest_vote: shipped 5x row-expansion
training grid vs per-q CONDITIONAL aggregates.

The shipped entry trains its 5 stumps by cross-joining the 600k-row
base with the 5-row tree dimension (5x row expansion) and group-by
(t, q). The shuffle itself is tiny (partial agg collapses to
|distinct q| x 5 groups map-side); the candidate cost is
materializing 5x rows through the expand + hash-agg. The cond_agg
variant keeps the base un-expanded and computes the same 10 sums as
per-q conditional aggregates (sum(when(in_bag_t, ...))), then
unpivots the 50-row result to the (t, q) grid driver-scale. Rows
with n=0 are dropped to reproduce the shipped candidate set exactly
(a zero-count threshold row would tie its cum-neighbor's score and
could steal the argmax by the threshold tiebreak).

Usage:
    python tools/ab_forest.py [--sf /root/testdata/sf0.1] [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_N_TREES = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all
    from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY, _t
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext24  # noqa: F401
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_forest")
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(sf_dir: str):
        return REGISTRY["ml_random_forest_vote"].fn(spark, sf_dir)

    def cond_agg(sf_dir: str):
        li = _t(spark, sf_dir, "lineitem").select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
            F.col("l_quantity").alias("q"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
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
        aggs = []
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
        pvw = hashed.groupBy("q").agg(*aggs)
        pv = (
            pvw.select(
                "q",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).cast("int").alias("t"),
                                F.col(f"n{t}").alias("n"),
                                F.col(f"pos{t}").alias("pos"),
                            )
                            for t in range(_N_TREES)
                        ]
                    )
                ).alias("s"),
            )
            .select(F.col("s.t").alias("t"), "q", F.col("s.n").alias("n"), F.col("s.pos").alias("pos"))
            .where(F.col("n") > 0)
        )
        tt = pv.groupBy("t").agg(F.sum("n").alias("nt"), F.sum("pos").alias("post"))
        wc = Window.partitionBy("t").orderBy("q")
        cum = pv.select(
            "t",
            "q",
            F.sum("n").over(wc).alias("nl"),
            F.sum("pos").over(wc).alias("posl"),
        )
        scored = cum.join(tt, "t").select(
            "t",
            F.col("q").alias("threshold"),
            (
                F.greatest(F.col("posl"), F.col("nl") - F.col("posl"))
                + F.greatest(
                    F.col("post") - F.col("posl"),
                    (F.col("nt") - F.col("nl")) - (F.col("post") - F.col("posl")),
                )
            ).alias("correct"),
            F.when(F.col("posl") * 2 >= F.col("nl"), 1).otherwise(0).alias("left_pred"),
            F.when(
                (F.col("post") - F.col("posl")) * 2 >= (F.col("nt") - F.col("nl")), 1
            )
            .otherwise(0)
            .alias("right_pred"),
        )
        best = (
            scored.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("t").orderBy(
                        F.desc("correct"), F.asc("threshold")
                    )
                ),
            )
            .where(F.col("rn") == 1)
            .select("t", "threshold", "left_pred", "right_pred")
        )
        model = best.agg(
            F.array_sort(
                F.collect_list(F.struct("t", "threshold", "left_pred", "right_pred"))
            ).alias("m")
        ).select(
            F.transform(F.col("m"), lambda s: s["threshold"]).alias("ths"),
            F.transform(F.col("m"), lambda s: s["left_pred"]).alias("lps"),
            F.transform(F.col("m"), lambda s: s["right_pred"]).alias("rps"),
        )
        vote = F.aggregate(
            F.sequence(F.lit(1), F.lit(_N_TREES)),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                F.col("q") <= F.element_at(F.col("ths"), i),
                F.element_at(F.col("lps"), i),
            ).otherwise(F.element_at(F.col("rps"), i)),
        )
        votes = li.crossJoin(F.broadcast(model)).select("y", vote.alias("v"))
        return votes.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when((F.col("v") * 2 > _N_TREES) == (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            F.sum(F.when(F.col("v").isin(0, _N_TREES), 1).otherwise(0))
            .cast("long")
            .alias("n_unanimous"),
        )

    variants = {
        "shipped": shipped,
        "cond_agg": cond_agg,
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

    best_t: dict[str, float] = {}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.reps):
        for name, fn in variants.items():
            t = run_once(fn)
            times[name].append(t)
            if name not in best_t or t < best_t[name]:
                best_t[name] = t
    for name in variants:
        if name not in best_t:
            continue  # --reps 0: identity pre-check only
        reps = ", ".join(f"{t:.2f}" for t in times[name])
        print(f"{name}: min={best_t[name]:.2f}s  reps=[{reps}]")


if __name__ == "__main__":
    main()
