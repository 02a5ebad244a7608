"""Isolated A/B for llm_keyword_rake: shipped 7-exchange pipeline vs a
segment-array restructure.

The shipped plan derives token-level `member` once and consumes it
THREE times (word stats, the scored window fold, the phrase-text
aggregate), paying two separate (doc_id, seg_id)-keyed passes (a
running-sum window + row_number, then a collect_list groupBy) plus
their join. The seg_arrays variant collects each segment ONCE into a
sorted (pos, w) array right after the boundary window — the groupBy
needs no exchange because hashpartitioning(doc_id) from the window
already satisfies ClusteredDistribution(doc_id, seg_id) — then
derives word stats by re-exploding the (already phrase-length-
filtered) arrays, and computes phrase text AND the position-ordered
score fold in one pass: phrase = array_join, score = an in-order
F.aggregate over the per-word scores (the same left-to-right IEEE
sum the ROWS window produced at its last row). Exchanges: 7 -> ~4.

Usage:
    python tools/ab_rake.py [--sf /root/testdata/sf0.1] [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all
    from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY, _t
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext24 as r24  # noqa: F401
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_rake")
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(sf_dir: str):
        return REGISTRY["llm_keyword_rake"].fn(spark, sf_dir)

    def seg_arrays(sf_dir: str):
        w_all = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        words = (
            _t(spark, sf_dir, "documents")
            .select("doc_id", F.posexplode(w_all).alias("pos0", "w0"))
            .select(
                "doc_id",
                (F.col("pos0") + 1).alias("pos"),
                F.lower(F.col("w0")).alias("w"),
            )
        )
        brk = (
            F.array_contains(
                F.array(*[F.lit(s) for s in r24._RAKE_STOPS]), F.col("w")
            )
            | ~F.col("w").rlike("^[a-z]+$")
        ).cast("int")
        seg = words.select("doc_id", "w", "pos", brk.alias("brk")).withColumn(
            "seg_id",
            F.sum("brk").over(
                Window.partitionBy("doc_id")
                .orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        pw = seg.where(F.col("brk") == 0).select("doc_id", "seg_id", "w", "pos")
        segs = (
            pw.groupBy("doc_id", "seg_id")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "w"))).alias("pws"))
            .where(F.size("pws") <= r24._MAX_PHRASE)
            .select(
                "doc_id",
                "seg_id",
                F.transform(F.col("pws"), lambda s: s["w"]).alias("ws"),
            )
        )
        wstat = (
            segs.select(F.explode("ws").alias("w"), F.size("ws").alias("n_words"))
            .groupBy("w")
            .agg(
                F.count("*").cast("long").alias("freq"),
                F.sum("n_words").cast("long").alias("degree"),
            )
        )
        occ = segs.select(
            "doc_id", "seg_id", F.posexplode("ws").alias("i", "w")
        ).join(F.broadcast(wstat), "w")
        phrases = (
            occ.groupBy("doc_id", "seg_id")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "i",
                            "w",
                            (F.col("degree").cast("double") / F.col("freq")).alias(
                                "wscore"
                            ),
                        )
                    )
                ).alias("sws")
            )
            .select(
                F.array_join(
                    F.transform(F.col("sws"), lambda s: s["w"]), " "
                ).alias("phrase"),
                F.aggregate(
                    F.col("sws"), F.lit(0.0), lambda acc, s: acc + s["wscore"]
                ).alias("score"),
            )
        )
        return (
            phrases.groupBy("phrase")
            .agg(
                F.count("*").cast("long").alias("n_occurrences"),
                F.min("score").alias("rake_score"),
            )
            .orderBy(F.desc("rake_score"), "phrase")
            .limit(15)
        )

    variants = {
        "shipped": shipped,
        "seg_arrays": seg_arrays,
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
