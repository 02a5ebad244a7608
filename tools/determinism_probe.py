"""Partition-order determinism probe.

Runs each query's SPARK side twice — once per shuffle-partition
setting — and compares canonical result values. Float aggregation
order, argmax ties, and LIMIT-without-tiebreak bugs show up as
cross-config differences long before they show up as cross-engine
driver mismatches (the r4 forward-asof tie bug was exactly this
class). Usage:

    python tools/determinism_probe.py [--sf DIR] [name ...]

Default names: the first 50 queries() entries (the driver window).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check import canon_rows  # noqa: E402  (tools/check.py canonicalizer)


def run_side(spark, fn, sf_dir, partitions):
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        return canon_rows(cols, rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--partitions", default="32,7", help="two shuffle-partition settings")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    p1, p2 = (int(x) for x in args.partitions.split(","))

    import __spark_entry__ as ent

    qs = ent.queries()
    names = args.names or list(qs)[:50]

    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("determinism-probe")
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    for n in names:
        try:
            c1, r1 = run_side(spark, qs[n], args.sf, p1)
            c2, r2 = run_side(spark, qs[n], args.sf, p2)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {n}: {type(e).__name__}: {str(e)[:140]}")
            bad += 1
            continue
        if c1 != c2:
            print(f"FAIL {n}: columns differ {c1} vs {c2}")
            bad += 1
        elif r1 != r2:
            diffs = [i for i, (a, b) in enumerate(zip(r1, r2)) if a != b]
            print(
                f"FAIL {n}: {len(r1)} vs {len(r2)} rows, first diff at "
                f"{diffs[0] if diffs else 'length'}"
            )
            if diffs:
                print(f"     {p1}p: {r1[diffs[0]]}")
                print(f"     {p2}p: {r2[diffs[0]]}")
            bad += 1
        else:
            print(f"PASS {n}: {len(r1)} rows identical at {p1} and {p2} partitions")
    print(f"== {len(names) - bad} deterministic, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
