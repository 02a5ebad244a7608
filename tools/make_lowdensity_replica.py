"""Low-density 10x documents replica (VERDICT r9 item 4).

The standard 10x replica (tools/scale_probe.py) appends " copy{i}" to
each copy's text, so every document gains 9 cross-copy NEAR-DUPS —
by construction the near-dup density is ~10x sf0.1's, the LSH
components merge into ~60 giant clusters over 50k docs, and the four
closure entries' DuckDB recursive-CTE oracles (reach0 materializes
sum-over-components of size^2 pairs) run >50 min and were excluded
from the r5/r9 campaigns with evidence-in-lieu.

This tool builds the replica the item asks for: perturb each copy
MORE — a per-copy alphabet-substitution cipher — so near-dup DENSITY
stays at the sf0.1 level while the row count is still 10x:

- each copy maps every letter/digit through a rotation substitution
  (translate a->.., A->.., 0->.. by the copy's rotation amount).
  A substitution is a BIJECTION on 5-char shingles, so within one
  copy the pairwise JACCARD matrix — the true near-dup structure —
  is exactly isomorphic to the base corpus.
- across copies, every shingle containing at least one letter or
  digit differs (distinct rotations per copy), so cross-copy
  Jaccard ~ 0 and MinHash band collisions across copies are chance-
  level (the --verify pass measures the realized count: 0).

Subtlety (measured, not guessed): Jaccard is cipher-invariant but the
REALIZED minhash draw is not — md5 values of every shingle redraw
under a cipher, and with a large shared-shingle pool the collision
count's variance across draws is enormous (if a rotation lands a
very common shingle at the global md5 minimum, a big fraction of
docs share that mh component and its band buckets go quadratic).
Rotation scan on the 5k-doc base (copy i's internal pair count ==
lsh_candidate_pairs(cipher_i(base)), so this measures each copy
directly): realized densities span 0.55x..19.6x of the base draw's
179,426 pairs. ROTATIONS below picks the nine closest to 1x
(0.55x-2.19x; identity copy 0 is exactly 1x), giving a replica at
~13.8x base pairs total — vs ~70x for naive rot 1..9 and the
unbounded merged-cluster blowup of the dense " copy{i}" replica.

Second subtlety (also measured): rotations cannot make cross-copy
collisions EXACTLY zero. The corpus charset is space+lowercase and
its min text length is 44, so every shingle carries a letter and no
shingle string survives a rotation — but two DIFFERENT base 5-grams
u, v with rot_i(u) == rot_j(v) produce a SHARED shingle between
copies i and j, and the synthetic vocabulary is small enough that
322 such chance band collisions materialize at 50k docs. A few
hundred random cross-links are enough to merge each copy's giant
near-dup component into one 10x-size giant — precisely the
sum-of-size^2 blowup that makes the closure oracle infeasible — so
the build finishes with a PRUNE pass: drop every doc incident to a
cross-copy candidate pair (band-key equality is pairwise, so
removing docs can only remove pairs, never create them; the pass
re-verifies cross-copy == 0 on the pruned corpus). Cost: ~1% of
docs, density otherwise untouched.

Result: the LSH component structure is ~10 independent sf0.1-shaped
instances — components stay small, the recursive closure oracle is
linear in copies instead of quadratic in merged-cluster size, and the
four excluded entries get a DIRECT 10x oracle adjudication.

Only `documents` is replicated at 10x: the four adjudicated entries
(llm_dedup_components, llm_dedup_keep_best, llm_dedup_cluster_sizes,
llm_minhash_jaccard_estimate) read no other table. The remaining nine
tables are copied through at 1x so tools/check.py's view registration
finds every table file; the dir is NOT a general 10x replica — use
/tmp/sf1.0 (scale_probe.py) for everything else.

    python tools/make_lowdensity_replica.py [--src /root/testdata/sf0.1]
        [--out /tmp/sf1.0ld] [--copies 10] [--verify]
"""

from __future__ import annotations

import argparse
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# density-selected rotation per copy slot (see module docstring);
# measured realized pair density vs the base draw in the comment
ROTATIONS = [
    0,  # 1.00x (identity)
    5,  # 0.59x
    6,  # 2.19x
    11,  # 0.55x
    12,  # 1.83x
    14,  # 1.49x
    17,  # 1.81x
    19,  # 1.54x
    20,  # 0.81x
    23,  # 2.02x
]

PASSTHROUGH = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "embeddings",
]


def cipher_col(col, i: int):
    """Rotation-by-i substitution over lower/upper/digits (identity
    for i == 0). Distinct i < 26 give distinct letter rotations."""
    if i == 0:
        return col
    lo, up, dg = string.ascii_lowercase, string.ascii_uppercase, string.digits
    c = F.translate(col, lo, lo[i % 26 :] + lo[: i % 26])
    c = F.translate(c, up, up[i % 26 :] + up[: i % 26])
    return F.translate(c, dg, dg[i % 10 :] + dg[: i % 10])


def build(spark, src: str, out: str, copies: int) -> int:
    os.makedirs(out, exist_ok=True)
    for t in PASSTHROUGH:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    assert copies <= len(ROTATIONS), "extend ROTATIONS (density-scan new amounts)"
    docs = spark.read.parquet(f"{src}/documents.parquet")
    offset = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(copies):
        rot = ROTATIONS[i]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
                *[
                    cipher_col(F.col(c), rot).alias(c) if c == "text" else F.col(c)
                    for c in docs.columns
                    if c != "doc_id"
                ],
            )
        )
    allc = parts[0]
    for c in parts[1:]:
        allc = allc.unionByName(c)
    allc.write.mode("overwrite").parquet(f"{out}/documents.tmp.parquet")
    docs = spark.read.parquet(f"{out}/documents.tmp.parquet")

    # prune pass (module docstring): docs incident to a cross-copy
    # band collision would merge the per-copy giants — drop them
    from machine_telemetry_etl_ml_pipeline_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_from_docs,
    )

    cross = lsh_candidate_pairs(minhash_from_docs(docs)).filter(
        (F.col("a") / offset).cast("long") != (F.col("b") / offset).cast("long")
    )
    bad = (
        cross.select(F.col("a").alias("doc_id"))
        .union(cross.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    n_bad = bad.count()
    docs.join(bad, "doc_id", "left_anti").write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    import shutil

    shutil.rmtree(f"{out}/documents.tmp.parquet")
    pruned = spark.read.parquet(f"{out}/documents.parquet")
    n = pruned.count()
    # UNCONDITIONAL re-verification of the central invariant (ADVICE
    # r10): the prune argument ("removing docs can only remove pairs")
    # is sound, but the adjudication's per-copy factorization rests on
    # cross-copy == 0, so measure it on the corpus actually shipped —
    # every build, not just --verify runs.
    cross_after = (
        lsh_candidate_pairs(minhash_from_docs(pruned))
        .filter((F.col("a") / offset).cast("long") != (F.col("b") / offset).cast("long"))
        .count()
    )
    assert cross_after == 0, (
        f"post-prune cross-copy candidate pairs = {cross_after} (expected 0); "
        "replica is NOT factorable — do not adjudicate against it"
    )
    # machine-readable manifest so downstream tools (adjudicate_closure)
    # read the build's offset/copies instead of trusting flag defaults
    import json

    with open(os.path.join(out, "MANIFEST.json"), "w") as fh:
        json.dump(
            {
                "kind": "lowdensity_cipher_replica",
                "src": src,
                "copies": copies,
                "offset": offset,
                "rotations": ROTATIONS[:copies],
                "documents_rows": n,
                "pruned_docs": n_bad,
                "cross_copy_candidate_pairs_after_prune": cross_after,
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(
        f"documents: {n} rows ({copies} cipher copies, offset {offset}, "
        f"{n_bad} rotation-coincident docs pruned, "
        f"post-prune cross-copy pairs {cross_after})"
    )
    return offset


def verify(spark, src: str, out: str, offset: int) -> None:
    """Measure realized near-dup density: candidate pairs at the
    replica vs base, and how many cross the copy boundary (chance-
    level band collisions — expected ~0)."""
    from machine_telemetry_etl_ml_pipeline_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_from_docs,
    )

    base_pairs = lsh_candidate_pairs(
        minhash_from_docs(spark.read.parquet(f"{src}/documents.parquet"))
    ).count()
    rep = lsh_candidate_pairs(
        minhash_from_docs(spark.read.parquet(f"{out}/documents.parquet"))
    )
    total = rep.count()
    cross = rep.filter(
        (F.col("a") / offset).cast("long") != (F.col("b") / offset).cast("long")
    ).count()
    print(
        f"candidate pairs: base {base_pairs} -> replica {total} "
        f"({total / base_pairs:.2f}x), cross-copy {cross}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1.0ld")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("lowdensity_replica")
    spark.sparkContext.setLogLevel("ERROR")
    offset = build(spark, args.src, args.out, args.copies)
    if args.verify:
        verify(spark, args.src, args.out, offset)


if __name__ == "__main__":
    main()
