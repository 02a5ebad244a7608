"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet dir, then compares
row count + sorted column names + order-insensitive values
(floats with tolerance). Usage:

    python tools/check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v):
    """Type-faithful exact canonicalization (round-1 lesson: the driver's
    hash distinguishes int 3 from float 3.0 and preserves -0.0; the old
    %.6g float canonicalization masked exactly those divergences, so the
    local gate passed queries the driver failed). int != float != bool !=
    Decimal here, floats at full repr precision, -0.0 preserved."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v!r}"  # repr: full precision, keeps -0.0
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "date:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return "s:" + str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(enumerate(cols), key=lambda t: t[1])], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        action="append",
        help="testdata dir; repeatable — multi-SF sweeps catch "
        "scale-dependent latent bugs (a -0.0 centroid only appeared "
        "at sf0.001). Default: $SPARK_GRAFT_SF_DIR or sf0.01",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sfs = args.sf or [os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")]

    import __spark_entry__ as ent
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("check")
    rc = 0
    for sf in sfs:
        if len(sfs) > 1:
            print(f"\n#### SF dir: {sf}")
        rc |= run_sf(spark, ent, sf, args.names)
    sys.exit(rc)


def run_sf(spark, ent, sf_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        # a table is either a single parquet file (driver testdata) or a
        # Spark-written DIRECTORY of part files (e.g. the scale-probe
        # replica) — glob the parts in the directory case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    names = names or list(qs)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            # Fetch through Arrow, not fetchall(): DuckDB's Python fetchall
            # collapses HUGEINT (sum of BIGINT) to plain int, which masked
            # the exact type divergence the driver's hash sees (round-2
            # red row ext_salted_agg). Arrow keeps it as decimal128.
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            ocols = list(tbl.column_names)
            # positional, not to_pylist() dicts: dict keys would
            # silently collapse duplicate column names
            ocells = [col.to_pylist() for col in tbl.columns]
            orows = list(zip(*ocells)) if ocells else []
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        sc, sr = canon_rows(scols, srows)
        oc, orr = canon_rows(ocols, orows)
        ok = True
        if len(sr) != len(orr):
            print(f"FAIL {name}: row count spark={len(sr)} duckdb={len(orr)}")
            ok = False
        elif sc != oc:
            print(f"FAIL {name}: columns spark={sc} duckdb={oc}")
            ok = False
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            ok = False
        if ok:
            print(f"PASS {name}: {len(sr)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            failures.append(name)
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if failures:
        print("failing:", " ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    main()
