"""Isolated A/B for llm_keyword_rake: forced F.broadcast(wstat) hint
vs planner/AQE-chosen join for the word-stats attach.

ADVICE r9: the forced hint OOMs instead of degrading to a shuffle
join if the vocabulary ever exceeds the broadcast threshold (real
text rather than the bounded synthetic corpus), and it removes AQE's
escape hatch. This A/B measures whether the hint buys anything at
sf0.1 — if AQE picks broadcast anyway (wstat is vocabulary-bounded
and tiny), the hint is pure risk and should go.

Usage:
    python tools/ab_rake_hint.py [--sf /root/testdata/sf0.1] [--reps 4]
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

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all
    from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext24  # noqa: F401
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("ab_rake_hint")
    spark.sparkContext.setLogLevel("ERROR")

    fn = REGISTRY["llm_keyword_rake"].fn
    real_broadcast = F.broadcast

    def run(tag: str, hint: bool) -> float:
        # the fn resolves F.broadcast at call time from the shared
        # functions module; identity-patching it is exactly "no hint"
        F.broadcast = real_broadcast if hint else (lambda df: df)
        try:
            t0 = time.monotonic()
            rows = fn(spark, args.sf).collect()
            dt = time.monotonic() - t0
        finally:
            F.broadcast = real_broadcast
        print(f"  {tag}: {dt:.2f}s  ({len(rows)} rows)", flush=True)
        return dt

    results: dict[str, list[float]] = {"hint": [], "nohint": []}
    for rep in range(args.reps):
        print(f"rep {rep + 1}/{args.reps}")
        # interleave, alternating order to cancel warmup drift
        order = ["hint", "nohint"] if rep % 2 == 0 else ["nohint", "hint"]
        for tag in order:
            unpersist_all(spark)
            results[tag].append(run(tag, tag == "hint"))

    for tag, ts in results.items():
        print(f"{tag}: min={min(ts):.2f}s  all={[f'{t:.2f}' for t in ts]}")

    # sanity: identical output
    F.broadcast = real_broadcast
    a = {tuple(r) for r in fn(spark, args.sf).collect()}
    F.broadcast = lambda df: df
    b = {tuple(r) for r in fn(spark, args.sf).collect()}
    F.broadcast = real_broadcast
    print("identical output:", a == b)


if __name__ == "__main__":
    main()
