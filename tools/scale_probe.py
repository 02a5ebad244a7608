"""Empirical scale probe: synthesize an Nx replica of an SF dir and run
the bench headline suite on it.

    python tools/scale_probe.py [--src /root/testdata/sf0.1]
                                [--out /tmp/sf1.0] [--copies 10]

Big tables are replicated with offset keys (so join cardinalities scale
— every copy of lineitem joins its own copy of orders) and per-copy
text perturbation (so text/dedup ops see near-dups across copies, the
adversarial case for LSH); dimension tables are left unchanged, like a
real 100 TB star schema whose dims stay small. The probe then runs
bench.py against the replica: the check is not the absolute number but
the SHAPE — no single-partition stages, no superlinear-in-input
queries (output-bound ops like LSH pair generation are called out in
SCALE.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BIG = {
    # table -> (offset key columns, text column or None)
    "lineitem": (["l_orderkey"], None),
    "orders": (["o_orderkey"], None),
    "events": (["event_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def replicate(spark, src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, (key_cols, text_col) in BIG.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        maxes = df.agg(*[F.max(k).alias(k) for k in key_cols]).collect()[0]
        parts = []
        for i in range(copies):
            c = df
            for k in key_cols:
                c = c.withColumn(k, F.col(k) + F.lit(i * (maxes[k] + 1)))
            if text_col is not None and i > 0:
                # per-copy perturbation: copies are near-dups, not exact
                c = c.withColumn(
                    text_col, F.concat(F.col(text_col), F.lit(f" copy{i}"))
                )
            parts.append(c)
        allc = parts[0]
        for c in parts[1:]:
            allc = allc.unionByName(c)
        allc.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"replicated {t}: {allc.count()} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{args.out}/lineitem.parquet"):
        replicate(spark, args.src, args.out, args.copies)
    else:
        print(f"{args.out} exists, skipping generation")
    spark.stop()

    if not args.skip_bench:
        os.environ["SPARK_GRAFT_SF_DIR"] = args.out
        os.execv(sys.executable, [sys.executable, "bench.py"])


if __name__ == "__main__":
    main()
