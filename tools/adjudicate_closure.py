"""Per-copy factored closure adjudication at the low-density replica.

The monolithic DuckDB recursive-closure oracle over all 10 copies at
/tmp/sf1.0ld carries ~10 concurrent ~4900-doc giants (~240M reach
pairs); if that single statement is still too slow, this tool runs
the SAME oracle SQL once per copy — the `documents` view restricted
to one copy's doc_id range — and merges the per-copy results.

The factorization is EXACT, not approximate: the replica is built
with cross-copy candidate pairs == 0 (verified unconditionally at
build by make_lowdensity_replica.py's post-prune check, and
RE-CHECKED HERE at adjudication time before any oracle runs — a
dense or stale target dir aborts with a precondition error instead
of producing confusing value-mismatch FAILs), so the LSH band graph
is a disjoint union of per-copy graphs, and connected components of
a disjoint union are the union of per-copy components:

- llm_dedup_components / llm_dedup_keep_best: per-copy rows are the
  full-corpus rows for that copy's docs verbatim (labels are global
  doc_ids; winners are per-component) -> plain concatenation.
- llm_dedup_cluster_sizes: the histogram is additive -> group the
  concatenated per-copy rows by cluster_size, sum the counts.

The Spark side is NOT factored: the engine's queries() run over the
FULL 10x replica exactly as the gate would run them. Comparison uses
tools/check.py's canonicalization (type-faithful, order-insensitive).

`--offset`/`--copies` default from the replica's MANIFEST.json
(written by the builder); the flags override for manifest-less dirs.

    python tools/adjudicate_closure.py [--sf /tmp/sf1.0ld]
        [--offset N] [--copies N] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.check import canon_rows  # noqa: E402

CLOSURE_ENTRIES = [
    "llm_dedup_components",
    "llm_dedup_keep_best",
    "llm_dedup_cluster_sizes",
]


def oracle_by_copy(sql: str, doc_path: str, offset: int, copies: int, name: str):
    """Run `sql` once per copy and merge (see module docstring)."""
    cols = None
    merged: list[tuple] = []
    for c in range(copies):
        con = duckdb.connect()
        lo, hi = c * offset, (c + 1) * offset
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{doc_path}' "
            f"WHERE doc_id >= {lo} AND doc_id < {hi}"
        )
        t0 = time.time()
        tbl = con.execute(sql).fetch_arrow_table()
        con.close()
        cols = list(tbl.column_names)
        cells = [col.to_pylist() for col in tbl.columns]
        merged.extend(zip(*cells) if cells else [])
        print(f"  copy {c}: {tbl.num_rows} rows ({time.time()-t0:.0f}s)", flush=True)
    if name == "llm_dedup_cluster_sizes":
        # additive histogram: sum counts per cluster_size
        idx = {k: i for i, k in enumerate(cols)}
        acc: dict = {}
        for r in merged:
            k = r[idx["cluster_size"]]
            a = acc.setdefault(k, [0, 0, 0])
            a[0] += r[idx["n_clusters"]]
            a[1] += r[idx["n_docs"]]
            a[2] += r[idx["n_removable"]]
        merged = [
            tuple(
                {"cluster_size": k, "n_clusters": v[0], "n_docs": v[1], "n_removable": v[2]}[c]
                for c in cols
            )
            for k, v in acc.items()
        ]
    return cols, merged


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1.0ld")
    ap.add_argument("--offset", type=int, default=None)
    ap.add_argument("--copies", type=int, default=None)
    ap.add_argument(
        "--check-only",
        action="store_true",
        help="exit after the factorability precondition (no oracles run)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or CLOSURE_ENTRIES

    # offset/copies come from the builder's manifest (ADVICE r10: the
    # old hard-coded --offset 5000 silently coupled to the builder's
    # max(doc_id)+1); explicit flags override, and a manifest-less dir
    # with no flags is an error rather than a guess.
    manifest = {}
    mpath = os.path.join(args.sf, "MANIFEST.json")
    if os.path.exists(mpath):
        import json

        with open(mpath) as fh:
            manifest = json.load(fh)
    offset = args.offset if args.offset is not None else manifest.get("offset")
    copies = args.copies if args.copies is not None else manifest.get("copies")
    if offset is None or copies is None:
        sys.exit(
            f"no MANIFEST.json under {args.sf} and --offset/--copies not given; "
            "rebuild the replica with tools/make_lowdensity_replica.py "
            "(it writes the manifest) or pass both flags explicitly"
        )

    import __spark_entry__ as ent
    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    doc_path = f"{args.sf}/documents.parquet"
    if os.path.isdir(doc_path):
        doc_path = f"{doc_path}/*.parquet"

    spark = get_spark("adjudicate_closure")
    spark.sparkContext.setLogLevel("ERROR")

    # Precondition check (ADVICE r10): the per-copy factorization is
    # exact ONLY if the band graph has zero cross-copy candidate
    # pairs. Measure it on the TARGET dir before running any oracle —
    # pointing at the dense replica or a stale build must abort here,
    # not surface as value-mismatch FAILs hours later.
    from pyspark.sql import functions as F

    from machine_telemetry_etl_ml_pipeline_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_from_docs,
    )

    t0 = time.time()
    cross = (
        lsh_candidate_pairs(
            minhash_from_docs(spark.read.parquet(f"{args.sf}/documents.parquet"))
        )
        .filter((F.col("a") / offset).cast("long") != (F.col("b") / offset).cast("long"))
        .count()
    )
    if cross != 0:
        sys.exit(
            f"PRECONDITION FAILED: {cross} cross-copy candidate pairs at "
            f"{args.sf} (offset {offset}) — the per-copy factorization is "
            "invalid here. This is not a low-density cipher replica (or it "
            "is stale); rebuild with tools/make_lowdensity_replica.py."
        )
    print(f"precondition: cross-copy candidate pairs == 0 ({time.time()-t0:.0f}s)", flush=True)
    if args.check_only:
        sys.exit(0)
    qs, oracles = ent.queries(), ent.oracle_sql()
    rc = 0
    for name in names:
        print(f"== {name}", flush=True)
        t0 = time.time()
        sdf = qs[name](spark, args.sf)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        ocols, orows = oracle_by_copy(
            oracles[name], doc_path, offset, copies, name
        )
        sc, sr = canon_rows(scols, srows)
        oc, orr = canon_rows(ocols, orows)
        if len(sr) != len(orr):
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)}")
            rc = 1
        elif sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            rc = 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            rc = 1
        else:
            print(
                f"PASS {name}: {len(sr)} rows (spark {t_spark:.0f}s, "
                f"full-replica plan vs per-copy factored oracle)"
            )
    sys.exit(rc)


if __name__ == "__main__":
    main()
