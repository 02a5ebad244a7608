"""Physical-plan audit over the bench headline queries.

For each query: construct the frame under `operators/plancap.capture()`
(recording the finalized executed plan of every construction-time
action — per-round checkpoint rotations and bounded stats collects in
the iterative entries), collect the residual frame, then summarize the
scale-relevant plan properties over ALL of those plans — exchanges
(shuffles), broadcast vs sort-merge joins, filter pushdown,
whole-stage-codegen spans, scan column pruning. This is the work a
timed run actually performs; before the capture hook (r7) the
iterative entries' construction-time plans were invisible to the tool
and PLANS.md carried hand-verified starred rows. Output is a markdown
table (PLANS.md is its checked-in snapshot): the audit trail that the
declarative plans actually compile to the physical shapes SCALE.md
claims.

    python tools/plan_audit.py [--sf /root/testdata/sf0.01] [--write]

`--write` splices the regenerated table into PLANS.md in place
(header and notes prose are preserved) — the standing close-out step
(VERDICT r10 item 1): regenerate whenever engine code changed so the
checked-in plan snapshot always postdates the last operator change.
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


def splice_plans_md(table_lines: list[str]) -> str:
    """Replace the markdown table block in PLANS.md (first `| query |`
    header line through the last contiguous `|` row) with
    `table_lines`, preserving the prose above and below."""
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    lines = open(path).read().splitlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("| query |"))
    end = start
    while end < len(lines) and lines[end].startswith("|"):
        end += 1
    out = lines[:start] + table_lines + lines[end:]
    # machine-readable freshness stamp (VERDICT r11 item 2): records
    # the HEAD the audit ran at, so tools/plans_fresh.py can fail any
    # state where engine commits postdate the last committed audit.
    import subprocess

    head = subprocess.check_output(
        ["git", "rev-parse", "HEAD"], cwd=os.path.dirname(path), text=True
    ).strip()
    dirty_pkg = subprocess.check_output(
        ["git", "status", "--porcelain", "--",
         "machine_telemetry_etl_ml_pipeline_spark", "__spark_entry__.py"],
        cwd=os.path.dirname(path), text=True,
    ).strip()
    stamp = f"<!-- plan-audit-stamp: head={head} pkg-dirty={1 if dirty_pkg else 0} -->"
    out = [l for l in out if not l.startswith("<!-- plan-audit-stamp:")]
    out.append(stamp)
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--write", action="store_true", help="splice the table into PLANS.md")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as ent
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    table = [
        "| query | shuffles | BHJ | SMJ | BNLJ | pushed scans | codegen spans | notes |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for line in table:
        print(line, flush=True)
    from machine_telemetry_etl_ml_pipeline_spark.operators import plancap
    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all

    for name in bench.HEADLINE:
        with plancap.capture() as constr_plans:
            df = qs[name](spark, args.sf)
            # collect, not a noop write: the write executes a CLONED
            # QueryExecution, leaving this handle's adaptive plan
            # un-finalized (no codegen markers, provisional join strategy)
            df.collect()
        plans = list(constr_plans)
        plans.append(df._jdf.queryExecution().executedPlan().toString())
        parts = [audit(p) for p in plans]
        a = {
            k: (any(p[k] for p in parts) if isinstance(parts[0][k], bool)
                else sum(p[k] for p in parts))
            for k in parts[0]
        }
        unpersist_all(spark)  # entries may leave live final-round checkpoints
        notes = []
        if len(plans) > 1:
            notes.append(f"incl. {len(plans) - 1} construction-time plans")
        if a["group_limit"]:
            notes.append("partial WindowGroupLimit")
        if a["take_ordered"]:
            notes.append("TakeOrderedAndProject")
        if a["cartesian"]:
            notes.append("CARTESIAN (bad)")
        row = (
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | {a['bnlj']} "
            f"| {a['pushed']} | {a['codegen']} | {', '.join(notes)} |"
        )
        table.append(row)
        print(row, flush=True)

    if args.write:
        print(f"wrote {splice_plans_md(table)}")


if __name__ == "__main__":
    main()
