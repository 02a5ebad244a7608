"""Static money-channel gate (VERDICT r11 item 4).

The r11 100x sweep refined the cross-engine money-sum channel model:
`round(sum(<double>), k>0)` diverges between Spark and DuckDB when a
group's accumulated magnitude makes the 1e-k rounding grid only a few
double-ULPs wide (grid-width / ULP(sum) is the trigger — NOT term
count; ext_incremental_rollup opened the channel at just ~60k terms).
The r11 survey of the remaining F.round(F.sum...) sites was empirical
(the full-registry 100x ledger). This gate makes that survey a
standing static check so the ext_incremental_rollup class of miss
cannot recur silently when new sums are added:

For every `F.round(<expr containing F.sum/F.avg/F.mean>, k>0)` site
in the package, the enclosing registry entry must carry EITHER

  (a) a direct 100x-ledger PASS row (tools/ledger100_status.json,
      status "pass" or "pass-sink") — the empirical adjudication at
      60M-row depth; OR
  (b) a `money-grid:` annotation in the enclosing function docstring
      stating the bounded grid/ULP argument (e.g. "money-grid:
      inputs bounded to [0,1] rates over <=100 rows/group; grid/ULP
      > 1e6 at any SF").

`F.round(x)` / `F.round(x, 0)` is exempt: rounding to an INTEGER
boundary is cross-engine safe (integer boundaries have no shortest-
repr ambiguity — the r9 doctrine, re-proved by the 100x ledger).

Wired into tools/closeout.py and tests/test_money_gate.py; exits 1
on any unproven site.

    python tools/money_gate.py [--verbose]
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "machine_telemetry_etl_ml_pipeline_spark")
LEDGER = os.path.join(REPO, "tools", "ledger100_status.json")


def _register_name(fn: ast.FunctionDef) -> str:
    for dec in fn.decorator_list:
        if (
            isinstance(dec, ast.Call)
            and getattr(dec.func, "id", getattr(dec.func, "attr", "")) == "register"
            and dec.args
            and isinstance(dec.args[0], ast.Constant)
        ):
            return dec.args[0].value
    return fn.name


def find_sites() -> list[dict]:
    """Every F.round(..., k) call whose argument subtree contains
    F.sum/F.avg/F.mean, with its enclosing function and scale k."""
    sites = []
    for path in sorted(glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)):
        tree = ast.parse(open(path).read())
        funcs = [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]

        def enclosing(lineno):
            best = None
            for fn in funcs:
                if fn.lineno <= lineno <= (fn.end_lineno or fn.lineno):
                    if best is None or fn.lineno > best.lineno:
                        best = fn
            return best

        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "round"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
            ):
                continue
            has_sum = any(
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
                and n.func.attr in ("sum", "avg", "mean")
                and isinstance(n.func.value, ast.Name)
                and n.func.value.id == "F"
                for a in node.args
                for n in ast.walk(a)
            )
            if not has_sum:
                continue
            if len(node.args) < 2:
                k: object = 0
            elif isinstance(node.args[1], ast.Constant):
                k = node.args[1].value
            else:
                k = "dynamic"  # non-literal scale: treat as k>0
            fn = enclosing(node.lineno)
            sites.append(
                {
                    "file": os.path.relpath(path, REPO),
                    "line": node.lineno,
                    "entry": _register_name(fn) if fn else "<module>",
                    "k": k,
                    "doc": (ast.get_docstring(fn) or "") if fn else "",
                }
            )
    return sites


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    ledger = json.load(open(LEDGER))["entries"] if os.path.exists(LEDGER) else {}
    sites = find_sites()
    n_exempt = n_ledger = n_annot = 0
    violations = []
    for s in sites:
        if s["k"] == 0:
            n_exempt += 1
            verdict = "exempt-k0"
        elif ledger.get(s["entry"], {}).get("status") in ("pass", "pass-sink"):
            n_ledger += 1
            verdict = "100x-ledger"
        elif "money-grid:" in s["doc"]:
            n_annot += 1
            verdict = "annotated"
        else:
            violations.append(s)
            verdict = "UNPROVEN"
        if args.verbose:
            print(f"{s['file']}:{s['line']} {s['entry']} k={s['k']} -> {verdict}")

    print(
        f"money gate: {len(sites)} round-over-sum sites = {n_exempt} k=0 exempt "
        f"+ {n_ledger} 100x-ledger-proven + {n_annot} money-grid-annotated "
        f"+ {len(violations)} UNPROVEN"
    )
    for s in violations:
        print(
            f"  UNPROVEN {s['file']}:{s['line']} entry={s['entry']} k={s['k']} — "
            f"needs a 100x ledger PASS or a 'money-grid:' docstring bound"
        )
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
