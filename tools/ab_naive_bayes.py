"""Isolated A/B for ml_naive_bayes_sql: shipped lazy plan vs
localCheckpointing the (class x vocab) count table `wc`.

The shipped plan embeds wc — whose subtree is the EXPENSIVE part, the
exploded-train-corpus groupBy — inside three separate broadcast
builds (cand via cls_words, vocab, and wc itself). The r9 gbt A/B
showed ReuseExchange does not dedupe subtrees nested inside different
broadcast builds, so the corpus explode likely executes 3x in the one
action. wc is small (class x vocabulary rows) but NOT 1-row, so the
gbt collect-to-literals pattern does not apply — the candidate fix is
an eager localCheckpoint of wc (the label-prop edge-list pattern:
materialize the linear-sized table once, let the three consumers scan
the blocks).

Usage:
    python tools/ab_naive_bayes.py [--sf /root/testdata/sf0.1] [--reps 3]
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

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import (
        checkpoint_rotate,
        note_live,
        unpersist_all,
    )
    from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY, _t
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext7  # noqa: F401
    from machine_telemetry_etl_ml_pipeline_spark.registry_ext7 import (
        _NB_SPLIT,
        words_col,
    )
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_naive_bayes")
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(sf_dir: str):
        return REGISTRY["ml_naive_bayes_sql"].fn(spark, sf_dir)

    def ckpt_wc(sf_dir: str):
        from pyspark.sql.window import Window

        d = _t(spark, sf_dir, "documents")
        words = d.select(
            "doc_id", "lang", F.explode(words_col(F.col("text"))).alias("w")
        )
        train = words.filter(F.col("doc_id") < _NB_SPLIT)
        wc, wc_ids = checkpoint_rotate(
            train.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
        )
        note_live(wc_ids)
        cls_words = wc.groupBy("lang").agg(F.sum("c").alias("n_words"))
        vocab = wc.agg(F.countDistinct("w").alias("v"))
        cls_docs = (
            d.filter(
                (F.col("doc_id") < _NB_SPLIT)
                & (F.size(words_col(F.col("text"))) > 0)
            )
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        total_docs = cls_docs.agg(F.sum("n_docs").alias("td"))
        prior = cls_docs.crossJoin(F.broadcast(total_docs)).select(
            F.col("lang").alias("cand"),
            F.log(F.col("n_docs").cast("double") / F.col("td")).alias("lp"),
        )
        test_words = words.filter(F.col("doc_id") >= _NB_SPLIT).select(
            "doc_id", F.col("lang").alias("true_lang"), "w"
        )
        cand = cls_words.select(F.col("lang").alias("cand"), "n_words")
        scored = (
            test_words.crossJoin(F.broadcast(cand))
            .crossJoin(F.broadcast(vocab))
            .join(
                F.broadcast(wc.select(F.col("lang").alias("cand"), "w", "c")),
                ["cand", "w"],
                "left",
            )
            .groupBy("doc_id", "true_lang", "cand", "n_words")
            .agg(
                F.sum(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                        / (F.col("n_words") + F.col("v"))
                    )
                ).alias("loglik")
            )
        )
        w_rank = Window.partitionBy("doc_id").orderBy(
            F.round(F.col("loglik") + F.col("lp"), 10).desc(), F.col("cand").asc()
        )
        pred = (
            scored.join(F.broadcast(prior), "cand")
            .withColumn("r", F.row_number().over(w_rank))
            .filter(F.col("r") == 1)
        )
        return pred.agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.when(F.col("cand") == F.col("true_lang"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
        )

    variants = {
        "shipped": shipped,
        "ckpt_wc": ckpt_wc,
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
