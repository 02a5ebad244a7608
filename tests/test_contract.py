"""Driver-contract guards: the priority window must reference real
registry entries (a typo would silently drop the name from the
driver's verification order), oracles must be a subset of queries,
and every oracle must mention only pre-registered tables."""

from __future__ import annotations

import re

import __spark_entry__ as ent
from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY

TABLES = set(
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def test_priority_names_all_exist():
    missing = [n for n in ent._PRIORITY if n not in REGISTRY]
    assert not missing, f"_PRIORITY names not in REGISTRY: {missing}"


def test_priority_has_no_duplicates():
    assert len(ent._PRIORITY) == len(set(ent._PRIORITY))


def test_contract_shapes():
    qs = ent.queries()
    osql = ent.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(REGISTRY)
    # r8: the last four rows-only entries were upgraded to exact
    # oracles (hash-threshold sampling, HLL error-bound verdicts, the
    # deterministic fake-codec decode) — every entry now carries one
    rows_only = sorted(set(qs) - set(osql))
    assert rows_only == [], rows_only


def test_oracles_reference_known_tables_only():
    """Every FROM/JOIN target in every oracle is a registered testdata
    view, a CTE defined in the same oracle, or a derived subquery —
    never a stray table the driver's DuckDB session won't have."""
    ident = r"[a-zA-Z_][a-zA-Z0-9_]*"
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        sql = q.oracle
        # strip expression-level FROMs (EXTRACT(x FROM y), IS [NOT]
        # DISTINCT FROM, substring(x FROM n)) before clause matching
        sql = re.sub(
            r"(?:DISTINCT|EPOCH|EPOCH_US|YEAR|MONTH|DAY|HOUR|MINUTE|SECOND|DOW|ISODOW|WEEK)\s+FROM\b",
            "FROM_EXPR",
            sql,
            flags=re.IGNORECASE,
        )
        # `AS MATERIALIZED (` is the DuckDB idiom the iterative-graph
        # oracles require (k-core/SSSP peel rounds explode under CTE
        # inlining) — match it alongside plain `AS (`.
        ctes = set(
            re.findall(
                rf"({ident})\s*(?:\([^)]*\))?\s+AS\s*(?:MATERIALIZED\s+)?\(",
                sql,
                flags=re.IGNORECASE,
            )
        )
        refs = set(
            re.findall(rf"(?<![a-zA-Z0-9_])(?:FROM|JOIN)\s+({ident})", sql, flags=re.IGNORECASE)
        )
        unknown = {
            r
            for r in refs
            if r.lower() not in {t.lower() for t in TABLES}
            and r not in ctes
            and r.lower() not in {"generate_series", "unnest", "values", "range"}
        }
        assert not unknown, f"{name}: oracle references unknown tables {unknown}"
