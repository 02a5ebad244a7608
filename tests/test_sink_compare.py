"""FAIL-path unit verification of the sink-path oracle compare.

SCALE.md's 100x ledger leans on tools/check_via_parquet.py for the
entries whose results outgrow a driver collect, so the compare's
FAIL semantics must themselves be verified: 1-ULP double drift FAILs,
-0.0 vs 0.0 FAILs (the r12 signbit witness — SQL EXCEPT alone treats
them equal, which is exactly the relaxation ADVICE r11 flagged),
NULL == NULL passes (IS NOT DISTINCT semantics, matching check.py's
"NULL" canon token), and multiset (not set) counting catches
duplicate-row cardinality skew. Pure DuckDB — no Spark session.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_via_parquet import compare_in_duckdb  # noqa: E402


@pytest.fixture()
def con(tmp_path):
    return duckdb.connect()


def bind(con, rows_sql):
    """Bind spark_res to an inline relation standing in for the
    parquet-spilled Spark result."""
    con.execute(f"CREATE OR REPLACE VIEW spark_res AS {rows_sql}")


def test_equal_sides_pass(con):
    bind(con, "SELECT 1 AS k, 2.5::DOUBLE AS v UNION ALL SELECT 2, 3.5")
    st, detail = compare_in_duckdb(
        con, "SELECT 2 AS k, 3.5::DOUBLE AS v UNION ALL SELECT 1, 2.5", ["k", "v"]
    )
    assert st == "PASS" and "2 rows" in detail


def test_one_ulp_fails(con):
    v = 1.1
    v_ulp = math.nextafter(v, 2.0)
    bind(con, f"SELECT {v!r}::DOUBLE AS v")
    st, detail = compare_in_duckdb(con, f"SELECT {v_ulp!r}::DOUBLE AS v", ["v"])
    assert st == "FAIL" and "multiset-different" in detail


def test_negative_zero_fails(con):
    # SQL equality says -0.0 == 0.0; the signbit witness must not.
    # (string casts: DuckDB constant-folds the numeric literal -0.0
    # through DECIMAL and loses the sign; '-0.0'::DOUBLE keeps it)
    bind(con, "SELECT '-0.0'::DOUBLE AS v")
    st, detail = compare_in_duckdb(con, "SELECT '0.0'::DOUBLE AS v", ["v"])
    assert st == "FAIL", "signed-zero divergence must not silently PASS"
    # and identical signed zeros still pass
    bind(con, "SELECT '-0.0'::DOUBLE AS v")
    st, _ = compare_in_duckdb(con, "SELECT '-0.0'::DOUBLE AS v", ["v"])
    assert st == "PASS"


def test_null_equals_null(con):
    bind(con, "SELECT NULL::DOUBLE AS v, 1 AS k")
    st, _ = compare_in_duckdb(con, "SELECT 1 AS k, NULL::DOUBLE AS v", ["v", "k"])
    assert st == "PASS"


def test_nan_equal_both_sides(con):
    # NaN == NaN for EXCEPT (DuckDB treats NaN as a distinct-equal
    # value in set ops); the signbit witness is NULLed for non-zero
    # values so NaN sign-bit noise cannot false-FAIL.
    bind(con, "SELECT 'nan'::DOUBLE AS v")
    st, _ = compare_in_duckdb(con, "SELECT 'nan'::DOUBLE AS v", ["v"])
    assert st == "PASS"


def test_multiset_cardinality_fails(con):
    # same SET of rows, different multiplicities, same total count
    bind(con, "SELECT 1 AS k UNION ALL SELECT 1 UNION ALL SELECT 2")
    st, detail = compare_in_duckdb(
        con, "SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 2", ["k"]
    )
    assert st == "FAIL" and "multiset-different" in detail


def test_row_count_gate(con):
    bind(con, "SELECT 1 AS k")
    st, detail = compare_in_duckdb(con, "SELECT 1 AS k UNION ALL SELECT 2", ["k"])
    assert st == "FAIL" and "row count" in detail


def test_column_mismatch_gate(con):
    bind(con, "SELECT 1 AS k")
    st, detail = compare_in_duckdb(con, "SELECT 1 AS other", ["k"])
    assert st == "FAIL" and "columns" in detail
