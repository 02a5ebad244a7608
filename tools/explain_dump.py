"""Dump `.explain("formatted")` for named registry entries to
plans/<tag>/<name>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit (judge checks plan claims against these).

    python tools/explain_dump.py --tag r13 --suffix before [--sf DIR] name...

The plan is the UNEXECUTED formatted plan (AdaptiveSparkPlan
isFinalPlan=false) of the DataFrame the entry returns — construction-
time actions (checkpoint rotations, bounded stats collects) run as a
side effect of building it, exactly as in the bench's timed region.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    import __spark_entry__ as ent

    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
