"""Oracle adjudication for results too large to collect.

tools/check.py replicates the driver gate by collecting both sides
into Python and comparing canonical rows — exact, but bounded by
spark.driver.maxResultSize and Python-loop throughput. At the 100x
replica a handful of entries return input-proportional results
(60M-row projections, unpivots) whose serialized size breaks the
1 GiB collect ceiling. Those are harness limits, not engine defects:
at cluster scale such results flow to a sink, never to one driver.

This tool adjudicates that class without any driver collect:

  1. run the Spark query and WRITE the result to parquet (the sink
     path a real pipeline takes);
  2. load that parquet into DuckDB next to the oracle SQL;
  3. compare row counts, sorted column names, and multiset equality
     via two-way EXCEPT ALL — all inside DuckDB.

Values compare bitwise (DuckDB EXCEPT on DOUBLE is exact equality,
same bar as check.py's repr-based canon); the one relaxation is type
coercion: EXCEPT unifies union-compatible types (e.g. BIGINT sum vs
HUGEINT sum) that check.py's type-faithful canon would distinguish,
so a PASS here is recorded in SCALE.md as "row-faithful values,
coerced types" — weaker than the driver gate on dtype, equally strong
on values. NULLs: EXCEPT ALL treats NULLs as equal (IS NOT DISTINCT
semantics), matching the canon's "NULL" token.

    python tools/check_via_parquet.py --sf /tmp/sf10.0 name1 [name2 ...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--spill", default="/tmp/check_spill")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as ent
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("check_via_parquet")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_pass = n_fail = 0
    for name in args.names:
        t0 = time.time()
        spill = os.path.join(args.spill, name)
        shutil.rmtree(spill, ignore_errors=True)
        try:
            sdf = qs[name](spark, args.sf)
            scols = sorted(sdf.columns)
            sdf.write.mode("overwrite").parquet(spill)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW spark_res AS SELECT * FROM '{spill}/*.parquet'"
            )
            ocols = sorted(
                d[0] for d in con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            )
            if scols != ocols:
                print(f"FAIL {name}: columns spark={scols} duckdb={ocols}")
                n_fail += 1
                continue
            collist = ", ".join(f'"{c}"' for c in scols)
            n_s, n_o = con.execute(
                f"SELECT (SELECT count(*) FROM spark_res), "
                f"(SELECT count(*) FROM ({oracles[name]}))"
            ).fetchone()
            if n_s != n_o:
                print(f"FAIL {name}: row count spark={n_s} duckdb={n_o}")
                n_fail += 1
                continue
            diff = con.execute(
                f"SELECT count(*) FROM ("
                f"  (SELECT {collist} FROM spark_res"
                f"   EXCEPT ALL"
                f"   SELECT {collist} FROM ({oracles[name]}))"
                f"  UNION ALL"
                f"  (SELECT {collist} FROM ({oracles[name]})"
                f"   EXCEPT ALL"
                f"   SELECT {collist} FROM spark_res))"
            ).fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if diff:
            print(f"FAIL {name}: {diff} multiset-different rows of {n_s}")
            n_fail += 1
        else:
            print(
                f"PASS {name}: {n_s} rows multiset-equal, cols match "
                f"({time.time()-t0:.1f}s)"
            )
            n_pass += 1
        shutil.rmtree(spill, ignore_errors=True)
    print(f"\n== {n_pass} pass, {n_fail} fail (row-faithful values, coerced types)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
