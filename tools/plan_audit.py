"""Physical-plan audit over the bench headline queries.

For each query: execute through the noop sink, then summarize the
scale-relevant plan properties — exchanges (shuffles), broadcast vs
sort-merge joins, filter pushdown, whole-stage-codegen spans, scan
column pruning. Output is a markdown table (PLANS.md is its checked-in
snapshot): the audit trail that the declarative plans actually compile
to the physical shapes SCALE.md claims.

    python tools/plan_audit.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(plan: str) -> dict:
    # a finalized AdaptiveSparkPlan prints the final plan AND an
    # "== Initial Plan ==" section — audit only the final one
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "group_limit": "WindowGroupLimit" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "cartesian": "CartesianProduct" in plan,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    import bench
    import __spark_entry__ as ent
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    print("| query | shuffles | BHJ | SMJ | BNLJ | pushed scans | codegen spans | notes |")
    print("|---|---|---|---|---|---|---|---|")
    for name in bench.HEADLINE:
        df = qs[name](spark, args.sf)
        # collect, not a noop write: the write executes a CLONED
        # QueryExecution, leaving this handle's adaptive plan
        # un-finalized (no codegen markers, provisional join strategy)
        df.collect()
        a = audit(df._jdf.queryExecution().executedPlan().toString())
        notes = []
        if a["group_limit"]:
            notes.append("partial WindowGroupLimit")
        if a["take_ordered"]:
            notes.append("TakeOrderedAndProject")
        if a["cartesian"]:
            notes.append("CARTESIAN (bad)")
        print(
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | {a['bnlj']} "
            f"| {a['pushed']} | {a['codegen']} | {', '.join(notes)} |"
        )


if __name__ == "__main__":
    main()
