"""Interleaved re-measurement of individual bench entries (the
VERDICT r10 item-3 protocol: N interleaved reps at sf0.1 on HEAD,
bench-identical execution — noop sink, unpersist_all between runs,
min-of-reps — to classify an out-of-band driver-bench mover as
ambient vs attributed).

Control entries run in the same interleave: entries whose driver
timing sat INSIDE the ambient band anchor the run's local-vs-driver
offset, so the target's min can be read against the controls' mins
instead of against a bare historical number.

    python tools/remeasure.py [--sf /root/testdata/sf0.1] [--reps 5]
        [--controls name,name] target [target...]

Run NOTHING else concurrently (round protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1,
                    help="uncounted warm-up reps of EVERY name (default 1)")
    ap.add_argument(
        "--controls",
        default="ext_salted_join,llm_tfidf_topk_terms",
        help="comma-separated in-band entries run in the same interleave",
    )
    ap.add_argument("targets", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as ent
    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    names = args.targets + [c for c in args.controls.split(",") if c]

    def run_once(name: str) -> float:
        t0 = time.monotonic()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        unpersist_all(spark)
        return dt

    # Per-ENTRY warm-up reps, not counted (r12): warming only the
    # first name left per-entry first-touch costs — catalog/
    # bucketed-table exists-checks, per-plan codegen — inside rep 1
    # (observed: a 5.0s first rep on ext_bucketed_join_colocated vs
    # its 0.53s min). Every measured rep now starts warm.
    for _ in range(args.warmup):
        for n in names:
            run_once(n)

    all_ts: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        order = names if rep % 2 == 0 else list(reversed(names))
        for n in order:
            all_ts[n].append(run_once(n))
        print(
            f"rep {rep + 1}/{args.reps}: "
            + "  ".join(f"{n}={all_ts[n][-1]:.3f}s" for n in names),
            flush=True,
        )

    out = {
        n: {"min": round(min(ts), 3), "all": [round(t, 3) for t in ts]}
        for n, ts in all_ts.items()
    }
    print(json.dumps({"sf": args.sf, "reps": args.reps, "results": out}))


if __name__ == "__main__":
    main()
