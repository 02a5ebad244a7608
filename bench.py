"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>}

Each query executes through the noop sink — full plan execution on all
cores, no driver-side collect bottleneck (what a cluster run would do).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per engine capability family (scan/filter, window
# dedup, hash agg, multi-join, as-of, grouping sets, sessionization,
# text/LLM, vector search).
HEADLINE = [
    "ref_filter_range",
    "ref_latest_per_key",
    "ref_grouped_comparison",
    "ref_top_k_highest_value",
    "ext_join_revenue_by_nation",
    "ext_asof_join",
    "ext_rollup",
    "ext_window_running",
    "ext_session_windows",
    "ext_explode_wordcount",
    "llm_minhash_signatures",
    "llm_lsh_candidate_pairs",
    "llm_cosine_topk",
    "llm_quality_score",
    # round-2 additions (VERDICT item 7): the join/agg spine via TPC-H
    # and the iterative connected-components path.
    "tpch_q1",
    "tpch_q3",
    "llm_dedup_components",
    # round-2 flagship ops: the 6-way join spine and the tunable-recall
    # ANN path.
    "tpch_q5",
    "llm_ann_multiprobe_topk",
    # round-3 additions: the 5-way star join (Q9 profit rollup) and the
    # distributed-prefix-sum packing path.
    "tpch_q9",
    "llm_pack_sequences",
    # round-3 batch 2: lexical retrieval (explode + candidate-bounded
    # join) and the adaptive iterative graph path.
    "llm_bm25_score",
    "graph_pagerank",
    # round-4 additions (VERDICT r3 item 8): the window-heavy gap-fill /
    # rolling-median paths and the explode-heavy novel-ngram dedup
    # priority score — tracked so their plans can't regress silently.
    "ext_gap_fill_ffill",
    "ext_rolling_median",
    "llm_novel_ngram_ratio",
    # round-4: the skew-safe salted join on the 5-hot-key fact table
    # (bench-visible per VERDICT r3 item 9) and the new corpus-dedup /
    # sessionization heavyweights.
    "ext_salted_join",
    "llm_segment_dedup",
    "ext_session_dynamic_gap",
    # round-4 batch 2: keyword extraction (explode + vocab-keyed join +
    # group-limit window) and MOSS winnowing (doc-partitioned window-min
    # over gram hashes) — the two heaviest new text paths.
    "llm_tfidf_topk_terms",
    "llm_winnowing_fingerprints",
    # round-5 additions (VERDICT r4 item 6): the multi-shuffle r4
    # heavies — closed-form Naive Bayes (explode + broadcast-scored
    # cross join + argmax window), running distinct reach (user-keyed
    # first-seen window + day rollup), and the per-source length-band
    # percentile report (grouped approx-percentile over documents).
    "ml_naive_bayes_sql",
    "ext_running_distinct_users",
    "llm_length_bands_by_source",
    # round-5 (VERDICT r4 item 7): the co-located bucketed join — rep 1
    # pays the bucketed write, so min-of-reps tracks the shuffle-free
    # join itself (the recurring cost a nightly pipeline pays).
    "ext_bucketed_join_colocated",
    # round-5 batch 2+: the new iterative/graph/similarity heavies —
    # 3-step logistic GD (4 scans + broadcast weight joins), triangle
    # counting on the sparse co-purchase graph (wedge join), and
    # SemDeDup pruning (bucketed pair scoring with precomputed norms).
    "ml_logistic_regression_gd",
    "graph_triangle_count",
    # r9: headline slot moved to the corpus-size-adaptive twin — the
    # fixed-16-bucket original is a pinned quadratic (~n^2/16 pairs,
    # 12.9x wall at 10x rows) kept only as frozen verified surface;
    # the twin's bit-count grows with n so pair work stays near-linear.
    "llm_semdedup_prune_scaled",
    # round-5 late batches: the statistics/sketch plans worth tracking —
    # Mann-Whitney's global rank window (the one range-partitioned
    # sorted pass), interval-union merge (two window passes on one
    # user exchange), and the Count-Min sketch (4x fanned partial agg
    # collapsing to 256 cells + broadcast probe equi-join).
    "ml_mann_whitney_u",
    "ext_interval_merge",
    "ext_count_min_sketch",
    # round-6 additions: the two new iterative heavies — 2-round
    # boosted stumps (two groupBy+cumsum fits with broadcast stump
    # joins) and 3-round min-label propagation (K edge-join + min
    # rounds on one node key).
    "ml_gbt_stumps",
    "graph_label_propagation",
    # round-6 late batches: the five heaviest new plans — 7-round
    # k-core peel (checkpointed edge shrink), 3-scan GMM-EM (broadcast
    # parameter walk), per-user HMM sequence fold (groupBy + sorted
    # array aggregate), RAKE (explode + conditional-cumsum segments +
    # positional folds), and the 5-stump bagged forest (5x md5 grid
    # fit + per-row array-fold inference).
    "graph_k_core",
    "ml_gmm_em_1d",
    "ml_hmm_forward",
    "llm_keyword_rake",
    "ml_random_forest_vote",
    # round-11: the r10-changed order-statistics path — the single
    # rollup pass that folds the row count into the decile/percentile
    # scan (the r9 OOM fix minus a scan). Tracked so the one-scan
    # shape is plan-audited and can't regress silently.
    "ext_equiheight_histogram",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from machine_telemetry_etl_ml_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent

    qs = ent.queries()

    from machine_telemetry_etl_ml_pipeline_spark.operators.ckpt import unpersist_all

    def run_once(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        # OUTSIDE the timed window: free the query's surviving
        # localCheckpoint blocks (iterative entries leak their final
        # round's checkpoint by construction — the returned plan needs
        # it until the sink write completes). SEQUENTIAL-ONLY: this
        # global sweep frees blocks it does not own, so it is safe
        # exactly because run_once is called strictly one-at-a-time
        # with no streaming query active; a concurrent-rep or async-
        # sink bench variant must switch to ckpt.retire_live (which
        # frees only the ids the just-finished entries noted). Without this sweep a
        # 48-query x 3-rep suite accumulates hundreds of orphaned
        # block-manager entries whose GC/bookkeeping pressure shows up
        # as the uniform ~25% drift documented in SCALE.md
        # ("Bench-regression re-measure") — each query now starts from
        # the same clean block manager it would see run in isolation.
        unpersist_all(spark)
        return dt

    # Uncounted PER-ENTRY warm-up pass (r13 measurement fix, declared
    # in OPTIMIZATION_r13.md; the protocol tools/remeasure.py adopted
    # in r12): first-touch costs that belong to no steady-state rep —
    # catalog lookups, the bucketed-table existence check/creation in
    # ext_bucketed_join_colocated (measured 5.0s first rep vs 0.43s
    # warm), JIT of each entry's codegen — land here instead of
    # inflating rep 1 of the counted interleave. The old methodology
    # (one cheap-query warm-up only) kept those costs inside min-of-3,
    # which made catalog-sensitive entries flap across driver rounds
    # (VERDICT r12 "What's wrong" item 2). Disable with
    # SPARK_GRAFT_BENCH_WARMUP=0 to reproduce the old protocol.
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
        for name in HEADLINE:
            run_once(name)
    else:
        # legacy: JVM/codegen warm-up on a cheap query only
        run_once("ref_filter_range")

    # best-of-N per query: single runs swing ±20-100% with JIT warmup
    # and ambient machine load (measured r5: first rep of a query can
    # be 2-4x its steady state). Reps are INTERLEAVED — the whole
    # suite runs N times round-robin and each query keeps its min — so
    # a multi-second ambient stall lands on one pass of many queries
    # instead of consuming every rep of one query, and by the later
    # passes the JVM is fully warm for everything.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    per_query: dict[str, float] = {}
    for _ in range(reps):
        for name in HEADLINE:
            t = run_once(name)
            if name not in per_query or t < per_query[name]:
                per_query[name] = t
    per_query = {n: round(t, 3) for n, t in per_query.items()}

    total = round(sum(per_query.values()), 3)
    # The headline set grew round-over-round (14 -> 19 queries), so the
    # suite total is NOT comparable across rounds; r1_subset_wall_sec
    # sums exactly the round-1 queries for a like-for-like comparison.
    r1_set = HEADLINE[:14]
    r1_total = round(sum(per_query[n] for n in r1_set if n in per_query), 3)

    # Embed the ambient-drift classification against the latest
    # recorded round directly in the artifact (VERDICT r9 item 8): the
    # driver-vs-local spread (~±10-25% on same code) otherwise lets
    # ambient read as regression at suite level. Outliers listed here
    # are the exact set needing per-query attribution (tools/ab_*.py).
    compare = None
    try:
        import glob as _glob

        from tools.bench_compare import classify, load as _load_bench

        prior = sorted(_glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        # newest loadable baseline wins: a truncated driver artifact
        # yields a partial tail-recovered baseline (flagged in the
        # output); one with NOTHING recoverable is skipped for the
        # next-newest rather than silently dropping the comparison.
        for p in reversed(prior):
            try:
                compare = {
                    "vs": os.path.basename(p),
                    **classify(_load_bench(p), {"queries": per_query}),
                }
                break
            except ValueError:
                continue
    except BaseException as exc:  # noqa: BLE001 — the classification must
        # never fail the bench (r11: a SystemExit from the loader did
        # exactly that, killing the artifact before the JSON line)
        compare = {"error": str(exc)}

    payload = {
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "reps": reps,
        "agg": "min",
        "r1_subset_wall_sec": r1_total,
        "queries": per_query,
        "sf": sf,
        # Scaling-contract fields (VERDICT r13 items 2 and ADVICE r13
        # item 4): the EFFECTIVE master/core count and data dir the run
        # actually used, plus the warm-up protocol, so the driver's
        # low-vs-high-core probe and any cross-round comparison can
        # verify what was measured instead of trusting the env. All
        # additive — no existing key changes meaning.
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)),
        "master": spark.sparkContext.master,
        "sf_dir": sf_dir,
        "warmup": (
            "per-entry"
            if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
            else "legacy-single"
        ),
        "compare_to_prev": compare,
    }
    # In-tree twin of the driver artifact (VERDICT r10 item 4): the
    # driver's BENCH_r10.json kept only the tail of stdout and lost
    # 12/48 timings + the r1-subset line. Writing the full ledger to
    # the repo BEFORE printing guarantees every timing survives any
    # stdout truncation; the file is committed at round close-out.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_local.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
    except OSError:  # a read-only checkout must not fail the bench
        pass
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
