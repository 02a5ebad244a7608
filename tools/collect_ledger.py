"""Collect check.py chunk logs into a single ledger summary.

Parses PASS/FAIL/rows-only lines (tolerating interleaved Spark progress
bars on the same physical line) from a directory of chunk logs and
prints a summary: counts, slowest adjudications, failures, conflicting
verdicts across logs (a rerun PASS after a transient FAIL is expected;
a FAIL after a PASS is not — either way the conflict is surfaced, not
silently last-wins), and any names from the input list that never got
a verdict (chunk timeout).

--pattern widens the glob beyond chunk_*.log (e.g. to pick up mop-up
logs); keep logs from DIFFERENT replicas in different directories —
the collector has no notion of which SF a log came from.

    python tools/collect_ledger.py --logs /tmp/ledger100 \
        --names /tmp/ledger100_names.txt [--pattern '*.log']
"""

from __future__ import annotations

import argparse
import glob
import os
import re

LINE = re.compile(
    r"(PASS|FAIL|rows-only) ([a-z0-9_]+): (?:(\d+) rows\s+\(([\d.]+)s\)|(.*))"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="/tmp/ledger100")
    ap.add_argument("--names", default="/tmp/ledger100_names.txt")
    ap.add_argument("--pattern", default="chunk_*.log")
    args = ap.parse_args()

    verdicts: dict[str, tuple[str, int | None, float | None, str]] = {}
    # every sighting, for conflict detection: a FAIL in one log must
    # not be silently masked by a PASS in a later-sorted log (ADVICE
    # r11; observed live — ext_approx_quantile_sketch_merge FAILed on
    # a transient spark error in chunk_00 and PASSed on the mopA rerun)
    sightings: dict[str, list[tuple[str, str]]] = {}
    for f in sorted(glob.glob(os.path.join(args.logs, args.pattern))):
        with open(f, errors="replace") as fh:
            for raw in fh:
                # Spark progress bars share the physical line via \r
                for seg in raw.split("\r"):
                    m = LINE.search(seg)
                    if m:
                        status, name, rows, secs, detail = m.groups()
                        verdicts[name] = (
                            status,
                            int(rows) if rows else None,
                            float(secs) if secs else None,
                            (detail or "").strip(),
                        )
                        sightings.setdefault(name, []).append(
                            (status, os.path.basename(f))
                        )

    wanted = []
    if os.path.exists(args.names):
        wanted = [ln.strip() for ln in open(args.names) if ln.strip()]
    n_pass = sum(1 for v in verdicts.values() if v[0] == "PASS")
    n_fail = sum(1 for v in verdicts.values() if v[0] == "FAIL")
    n_ro = sum(1 for v in verdicts.values() if v[0] == "rows-only")
    missing = [n for n in wanted if n not in verdicts]

    print(f"adjudicated {len(verdicts)}: {n_pass} pass, {n_fail} fail, "
          f"{n_ro} rows-only; {len(missing)} missing")
    conflicts = {
        n: s for n, s in sightings.items() if len({st for st, _ in s}) > 1
    }
    if conflicts:
        print("\nCONFLICTING VERDICTS (last-parsed wins above — review each):")
        for name in sorted(conflicts):
            trail = ", ".join(f"{st}@{src}" for st, src in conflicts[name])
            print(f"  {name}: {trail}")
    if n_fail:
        print("\nFAILURES:")
        for name, (st, _, _, detail) in sorted(verdicts.items()):
            if st == "FAIL":
                print(f"  {name}: {detail}")
    if missing:
        print("\nMISSING (never adjudicated — chunk timeout?):")
        for n in missing:
            print(f"  {n}")
    timed = [(v[2], k, v[1]) for k, v in verdicts.items() if v[2] is not None]
    timed.sort(reverse=True)
    print("\nslowest 12 adjudications (harness wall = spark + collect + duckdb):")
    for secs, name, rows in timed[:12]:
        print(f"  {secs:8.1f}s  {name}  ({rows} rows)")


if __name__ == "__main__":
    main()
