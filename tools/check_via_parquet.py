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

Values compare bitwise-with-two-documented-relaxations (r12, per
ADVICE): DuckDB EXCEPT on DOUBLE is exact VALUE equality, but

  1. type coercion: EXCEPT unifies union-compatible types (e.g.
     BIGINT sum vs HUGEINT sum) that check.py's type-faithful canon
     would distinguish, so a PASS here is recorded in SCALE.md as
     "row-faithful values, coerced types" — weaker than the driver
     gate on dtype, equally strong on values;
  2. signed zero: SQL equality (hence EXCEPT) treats -0.0 == 0.0,
     while check.py's repr canon distinguishes them (that canon was
     built after a real -0.0 centroid bug). CLOSED rather than
     documented: for every DOUBLE/FLOAT column on either side, the
     diff also projects CASE WHEN c = 0 THEN signbit(c) END — NULL
     for non-zero values (so NaN sign-bit noise can't false-FAIL),
     true/false for -0.0/+0.0 — restoring exactly the distinction
     EXCEPT drops. Both sides evaluate the projection inside DuckDB
     (the Spark side is parquet re-read by DuckDB), so the function
     semantics are identical by construction.

NULLs: EXCEPT ALL treats NULLs as equal (IS NOT DISTINCT semantics),
matching the canon's "NULL" token.

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


def compare_in_duckdb(con, oracle_sql: str, spark_cols: list[str]) -> tuple[str, str]:
    """The DuckDB-side compare, factored out so tests can drive the
    FAIL paths directly (1-ULP doubles, -0.0 vs 0.0, NULL==NULL,
    multiset counts). Expects a `spark_res` view already bound to the
    Spark result's parquet. Returns (status, detail) where status is
    'PASS' or 'FAIL'."""
    odesc = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    ocols = sorted(d[0] for d in odesc)
    scols = sorted(spark_cols)
    if scols != ocols:
        return "FAIL", f"columns spark={scols} duckdb={ocols}"
    # double/float columns on EITHER side get a signed-zero witness
    # column (see module docstring, relaxation 2)
    sdesc = con.execute("DESCRIBE spark_res").fetchall()
    fp_cols = sorted(
        {d[0] for d in odesc if d[1] in ("DOUBLE", "FLOAT", "REAL")}
        | {d[0] for d in sdesc if d[1] in ("DOUBLE", "FLOAT", "REAL")}
    )
    collist = ", ".join(f'"{c}"' for c in scols)
    collist += "".join(
        f', CASE WHEN "{c}" = 0 THEN signbit("{c}") END AS "__sb_{c}"'
        for c in fp_cols
    )
    n_s, n_o = con.execute(
        f"SELECT (SELECT count(*) FROM spark_res), "
        f"(SELECT count(*) FROM ({oracle_sql}))"
    ).fetchone()
    if n_s != n_o:
        return "FAIL", f"row count spark={n_s} duckdb={n_o}"
    diff = con.execute(
        f"SELECT count(*) FROM ("
        f"  (SELECT {collist} FROM spark_res"
        f"   EXCEPT ALL"
        f"   SELECT {collist} FROM ({oracle_sql}))"
        f"  UNION ALL"
        f"  (SELECT {collist} FROM ({oracle_sql})"
        f"   EXCEPT ALL"
        f"   SELECT {collist} FROM spark_res))"
    ).fetchone()[0]
    if diff:
        return "FAIL", f"{diff} multiset-different rows of {n_s}"
    return "PASS", f"{n_s} rows multiset-equal, cols match"


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
    # 180M-row EXCEPT ALL compares must spill, not balloon: an
    # unbounded DuckDB reached 57 GB RSS and drew the OOM killer
    # when run next to a Spark session (r12). Cap it and give it a
    # disk temp dir — the compare is batch, not latency-sensitive.
    con.execute("SET memory_limit='32GB'")
    os.makedirs("/tmp/duckdb_sink_tmp", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_sink_tmp'")
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
            status, detail = compare_in_duckdb(con, oracles[name], scols)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if status == "FAIL":
            print(f"FAIL {name}: {detail}")
            n_fail += 1
        else:
            print(f"PASS {name}: {detail} ({time.time()-t0:.1f}s)")
            n_pass += 1
        shutil.rmtree(spill, ignore_errors=True)
    print(f"\n== {n_pass} pass, {n_fail} fail (row-faithful values, coerced types)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
