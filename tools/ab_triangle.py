"""Isolated A/B for graph_triangle_count: eager-collect (shipped)
vs lazy return, same harness discipline as the r7 checkpoint A/B
(fresh tuned session, warm-up, N interleaved reps, block-manager
sweep between runs, min-of-reps). Usage:

    python tools/ab_triangle.py [--sf /root/testdata/sf0.1] [--reps 3]
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
        retire_ids,
        unpersist_all,
    )
    from machine_telemetry_etl_ml_pipeline_spark.registry_ext9 import (
        _copurchase_edges,
        count_triangles,
    )
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_triangle")
    spark.sparkContext.setLogLevel("ERROR")

    def eager(sf_dir: str):
        """Shipped r7 shape: checkpoint, collect, retire, rebuild."""
        e, ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir))
        out = count_triangles(e)
        rows = out.collect()
        retire_ids(spark, ids)
        return spark.createDataFrame(rows, out.schema)

    def lazy_ckpt(sf_dir: str):
        """r6 shape: checkpoint shared edges, return the lazy plan
        (final checkpoint leaks until the sweep — bench semantics)."""
        e, _ids = checkpoint_rotate(_copurchase_edges(spark, sf_dir))
        return count_triangles(e)

    def lazy_plain(sf_dir: str):
        """Pre-r6 shape: no checkpoint, 5 re-derivations of the edge
        build inside one plan."""
        return count_triangles(_copurchase_edges(spark, sf_dir))

    variants = {"eager": eager, "lazy_ckpt": lazy_ckpt, "lazy_plain": lazy_plain}

    def run_once(fn) -> float:
        t0 = time.time()
        fn(args.sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        unpersist_all(spark)
        return dt

    # warm-up (uncounted): once per variant so JIT/codegen is hot
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
