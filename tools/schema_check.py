"""Testdata schema-drift pre-flight.

The driver regenerates /root/testdata between rounds and has changed
schemas twice (r3: events.ts TIMESTAMP(NANOS) -> timestamp[us] ntz;
r4: minted exact-tie duplicate rows). Code with hardcoded schema
assumptions fails *quietly* (dtype guards skip, streams bind wrong
types), so every round starts by diffing the live parquet schemas
against the committed snapshot before any query work.

Usage:
    python tools/schema_check.py            # diff live schemas vs snapshot
    python tools/schema_check.py --dump     # (re)write the snapshot
    python tools/schema_check.py --sf DIR   # check a specific SF dir

Exit code 0 = no drift, 1 = drift or missing tables.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata_schemas.json")


def table_schema(sf_dir: str, name: str):
    """Arrow schema for a file- or directory-shaped parquet table, as
    a stable {column: type-string} dict (ignores pandas metadata)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return None
        schema = pq.read_schema(parts[0])
    elif os.path.exists(path):
        schema = pq.read_schema(path)
    else:
        return None
    return {f.name: str(f.type) for f in schema}


def collect(sf_dirs):
    out = {}
    for sf in sf_dirs:
        tag = os.path.basename(sf.rstrip("/"))
        out[tag] = {t: table_schema(sf, t) for t in TABLES}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", action="store_true", help="rewrite the committed snapshot")
    ap.add_argument("--sf", action="append", help="testdata dir(s); default sf0.001/0.01/0.1")
    args = ap.parse_args()
    sfs = args.sf or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]

    live = collect(sfs)
    if args.dump:
        with open(SNAPSHOT, "w") as f:
            json.dump(live, f, indent=1, sort_keys=True)
        print(f"wrote {SNAPSHOT}")
        return 0

    if not os.path.exists(SNAPSHOT):
        print(f"no snapshot at {SNAPSHOT}; run with --dump first", file=sys.stderr)
        return 1
    with open(SNAPSHOT) as f:
        want = json.load(f)

    drift = 0
    for tag, tables in live.items():
        exp_tables = want.get(tag)
        if exp_tables is None:
            print(f"[new-sf] {tag}: not in snapshot")
            drift += 1
            continue
        for t in TABLES:
            got, exp = tables.get(t), exp_tables.get(t)
            if got == exp:
                continue
            drift += 1
            if got is None:
                print(f"[missing] {tag}/{t}")
                continue
            if exp is None:
                print(f"[new-table] {tag}/{t}: {got}")
                continue
            for col in sorted(set(got) | set(exp)):
                g, e = got.get(col), exp.get(col)
                if g != e:
                    print(f"[drift] {tag}/{t}.{col}: snapshot={e!r} live={g!r}")
    if drift:
        print(f"SCHEMA DRIFT: {drift} table(s) differ — fix readers before query work", file=sys.stderr)
        return 1
    print(f"schemas clean: {len(live)} SF dirs x {len(TABLES)} tables match snapshot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
