"""Invariant tests for the round-5 batch-9 entries (registry_ext14):
brute-force recomputation of the two-proportion z-test and Welch's
t-test from raw rows, plus statistical identities."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from machine_telemetry_etl_ml_pipeline_spark import registry_ext14  # noqa: F401
from machine_telemetry_etl_ml_pipeline_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF)


def _arm(user_id: int) -> int:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16) % 2


def test_ab_ztest_matches_brute_force(spark):
    """Arm sizes, conversions, rates, and the z statistic must match an
    independent Python recomputation over raw events."""
    row = _run(spark, "ml_ab_ztest_conversion").collect()[0]
    events = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    conv = defaultdict(int)
    users = set()
    for r in events:
        users.add(r.user_id)
        if r.event_type == "purchase" and r.ts.date().isoformat() == "2024-01-29":
            conv[r.user_id] = 1
    arms = {0: [0, 0], 1: [0, 0]}  # arm -> [n, conversions]
    for u in users:
        a = _arm(u)
        arms[a][0] += 1
        arms[a][1] += conv[u]
    (n0, c0), (n1, c1) = arms[0], arms[1]
    assert (row.n_control, row.conv_control) == (n0, c0)
    assert (row.n_treat, row.conv_treat) == (n1, c1)
    assert abs(row.rate_control - c0 / n0) < 1e-6
    assert abs(row.rate_treat - c1 / n1) < 1e-6
    p = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    assert abs(row.z_stat - z) < 1e-6


def test_welch_ttest_matches_brute_force(spark):
    """Means, t statistic, and Welch-Satterthwaite df must match the
    textbook formulas computed independently from raw cents."""
    row = _run(spark, "ml_welch_ttest").collect()[0]
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    groups = {0: [], 1: []}
    for r in orders:
        g = 1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
        groups[g].append(round(r.o_totalprice * 100))
    stats = {}
    for g, xs in groups.items():
        n = len(xs)
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        stats[g] = (n, mean, var)
    (n0, m0, v0), (n1, m1, v1) = stats[0], stats[1]
    assert (row.n_low, row.n_high) == (n0, n1)
    assert abs(row.mean_low - m0 / 100) < 1e-4
    assert abs(row.mean_high - m1 / 100) < 1e-4
    se0, se1 = v0 / n0, v1 / n1
    t = (m1 - m0) / math.sqrt(se0 + se1)
    df = (se0 + se1) ** 2 / (se0**2 / (n0 - 1) + se1**2 / (n1 - 1))
    # raw-cents t vs engine t (computed on /100 means) agree because the
    # /100 scaling cancels in the ratio
    assert abs(row.t_stat - t) < 1e-4
    assert abs(row.welch_df - df) < 1e-2
    assert min(n0, n1) - 1 <= row.welch_df <= n0 + n1 - 2
