"""Oracle float-transit audit (VERDICT r5 item 2).

The r5 driver red (ext_decimal_exact) and all four 10x differential
finds were ONE bug class: an aggregate that silently transits DOUBLE
in exactly one engine (DuckDB avg(DECIMAL) -> DOUBLE) or in both at a
magnitude where the post-round grid is coarser than the double's ULP
spread across partition orders. This tool sweeps every registered
oracle for the risky syntactic classes and, for the round-of-sum
class, measures the actual pre-/post-round magnitudes via DuckDB so
each entry gets a numeric headroom verdict instead of a guess.

Headroom model: round(x, k) is cross-engine-stable while the two
engines' double accumulations of x agree to well under 0.5 * 10^-k.
Double ULP at |x| is |x| * 2^-52; partition-order re-association
spreads the sum by a small multiple of ULP. We flag when
|x| > 10^-k * 2^46 (i.e. less than ~64 ULPs of slack to the rounding
grid) at 10x the bench SF — the same threshold that separated the
four real r5 finds (1e10-3e10 sums rounded at 4dp) from the entries
that passed.

Usage: python tools/oracle_audit.py [--sf /root/testdata/sf0.1]
Prints one line per flagged-class entry; exits 1 if any entry has
LOW headroom (needs the per-row-cents integer rewrite).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# |max| * 10^dp above this → fewer than ~64 ULPs from sum spread to the
# rounding grid at 10x; below → safe with orders of magnitude to spare.
ULP_SLACK_BITS = 46

# Entries audited by hand where the magnitude flag is a false positive:
# the LARGE columns are exact integer folds (single deterministic
# division at the end) and the remaining round(sum(...)) columns are
# provably safe. Keyed by entry -> justification (kept in the report).
ADJUDICATED = {
    "tpch_q1": "money sums fold as exact DECIMAL(38,0) cents/e4/e6; the "
    "remaining round(sum(l_quantity),4) sums INTEGER-valued doubles — "
    "exact at any accumulation order below 2^53",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--scale-mult", type=float, default=10.0,
                    help="extrapolation factor from --sf to the replica")
    args = ap.parse_args()

    import __spark_entry__ as ent

    osql = ent.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    avg_decimal = []
    flagged = []
    checked = []
    for name, sql in sorted(osql.items()):
        s = sql.lower()
        if re.search(r"avg\([^)]*decimal", s) or re.search(
            r"cast\(\s*avg[^;]*?as decimal", s
        ):
            avg_decimal.append(name)
        # round(sum(...), k) — capture the smallest k used (coarsest
        # grid is SAFEST; smallest headroom comes from the LARGEST k)
        # non-greedy span can swallow unrelated integer literals; real
        # rounding scales are 0-8 digits — drop larger false matches
        dps = [
            int(m)
            for m in re.findall(r"round\(\s*sum\([^;]*?,\s*(\d+)\s*\)", s)
            if int(m) <= 8
        ]
        if not dps:
            continue
        k = max(dps)
        try:
            rel = con.execute(sql)
            rows = rel.fetchall()
        except Exception as exc:  # oracle too costly / env-dependent here
            print(f"SKIP  {name}: oracle failed locally ({type(exc).__name__})")
            continue
        mx = 0.0
        for row in rows:
            for v in row:
                if isinstance(v, float):
                    mx = max(mx, abs(v))
        mx10 = mx * args.scale_mult
        # headroom in bits between the rounding grid and the sum's ULP
        import math

        risk = mx10 * (10 ** k)
        bits = math.log2(risk) if risk > 0 else 0.0
        if name in ADJUDICATED:
            verdict = "adj"
        else:
            verdict = "LOW" if bits > ULP_SLACK_BITS else "ok"
        checked.append((name, k, mx, mx10, bits, verdict))
        if verdict == "LOW":
            flagged.append(name)

    print(f"== avg(DECIMAL)-class oracles: {len(avg_decimal)} {avg_decimal}")
    print(f"== round(sum(...), k) oracles magnitude-checked: {len(checked)}")
    for name, k, mx, mx10, bits, verdict in checked:
        print(
            f"{verdict:>4}  {name:<36} dp={k}  max|v|={mx:.3g}  "
            f"at{args.scale_mult:g}x={mx10:.3g}  grid-bits={bits:.1f}"
        )
    print(f"== LOW-headroom (needs integer-cents rewrite): {flagged}")
    sys.exit(1 if flagged or avg_decimal else 0)


if __name__ == "__main__":
    main()
