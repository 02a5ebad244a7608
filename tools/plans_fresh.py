"""PLANS.md freshness check (VERDICT r11 item 2, made CI-style).

The r10 and r11 rounds both slipped the same way: PLANS.md was
regenerated, then engine code changed afterward, leaving the
committed plan snapshot claiming currency it no longer had. This
check makes that state mechanically detectable:

  - `tools/plan_audit.py --write` stamps PLANS.md with the git HEAD
    it ran at and whether the package tree was dirty;
  - this tool FAILS unless (a) the stamp exists, (b) the audit ran
    on a clean package tree, and (c) every commit touching
    `machine_telemetry_etl_ml_pipeline_spark/` or `__spark_entry__.py`
    is an ancestor of the stamped HEAD (i.e. no engine commit
    postdates the audit).

Uncommitted engine edits in the working tree also fail — an audit
can only vouch for the tree it saw.

    python tools/plans_fresh.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINE_PATHS = ["machine_telemetry_etl_ml_pipeline_spark", "__spark_entry__.py"]


def git(*args: str) -> str:
    return subprocess.check_output(["git", *args], cwd=REPO, text=True).strip()


def main() -> int:
    stamp = None
    for line in open(os.path.join(REPO, "PLANS.md")):
        m = re.match(r"<!-- plan-audit-stamp: head=([0-9a-f]+) pkg-dirty=([01]) -->", line.strip())
        if m:
            stamp = m
    if stamp is None:
        print("plans_fresh: FAIL — PLANS.md carries no plan-audit-stamp; "
              "run `python tools/plan_audit.py --write`")
        return 1
    head, dirty = stamp.group(1), stamp.group(2)
    if dirty == "1":
        print("plans_fresh: FAIL — the stamped audit ran on a DIRTY package tree "
              f"(head={head[:12]}); re-run plan_audit after committing engine changes")
        return 1
    last_engine = git("log", "-1", "--format=%H", "--", *ENGINE_PATHS)
    rc = subprocess.call(
        ["git", "merge-base", "--is-ancestor", last_engine, head], cwd=REPO
    )
    if rc != 0:
        print(f"plans_fresh: FAIL — engine commit {last_engine[:12]} postdates the "
              f"stamped audit head {head[:12]}; re-run `python tools/plan_audit.py "
              "--write` and commit PLANS.md last")
        return 1
    wt_dirty = git("status", "--porcelain", "--", *ENGINE_PATHS)
    if wt_dirty:
        print("plans_fresh: FAIL — uncommitted engine edits in the working tree:\n"
              + wt_dirty)
        return 1
    print(f"plans_fresh: OK — audit head {head[:12]} covers the latest engine "
          f"commit {last_engine[:12]}, package tree clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
