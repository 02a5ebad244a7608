from __future__ import annotations

from machine_telemetry_etl_ml_pipeline_spark.plans import telemetry as q


def test_get_latest_telemetry(telemetry):
    out = q.get_latest_telemetry(telemetry, "M001", limit=2).collect()
    assert len(out) == 2
    assert all(r.machineid == "M001" for r in out)
    ts = [r.timestamp_epoch for r in out]
    assert ts == sorted(ts, reverse=True)


def test_get_telemetry_range(telemetry):
    lo = telemetry.agg({"timestamp_epoch": "min"}).head()[0]
    out = q.get_telemetry_range(telemetry, "M002", lo, lo + 5 * 3600).collect()
    assert 1 <= len(out) <= 6
    assert all(lo <= r.timestamp_epoch <= lo + 5 * 3600 for r in out)


def test_get_machine_list(telemetry):
    assert [r.machineid for r in q.get_machine_list(telemetry).collect()] == [
        "M001", "M002", "M003",
    ]


def test_get_telemetry_stats(telemetry):
    s = q.get_telemetry_stats(telemetry).head()
    assert s.n == telemetry.count() and s.n_machines == 3
    s1 = q.get_telemetry_stats(telemetry, "M001").head()
    assert s1.n == 49  # 48 grid + 1 duplicate row


def test_latest_per_machine_dedup(telemetry):
    out = q.latest_per_machine(telemetry)
    assert out.count() == 3  # one row per machine, ties broken


def test_ranking_variants(telemetry):
    hi = q.get_highest_temperature_machines(telemetry, limit=3).collect()
    assert len(hi) == 3
    temps = [r.temperature for r in hi]
    assert temps == sorted(temps, reverse=True)
    lo = q.get_lowest_humidity_machines(telemetry, limit=3).collect()
    # bounds guard: no out-of-range humidity in the result
    assert all(0 < r.humidity_v <= 100 for r in lo)


def test_get_machines_by_status_ilike(telemetry):
    out = q.get_machines_by_status(telemetry, "ACT").collect()  # case-insensitive
    assert all("act" in r.status.lower() for r in out)


def test_comparison_stats_ordering(telemetry):
    rows = q.get_machine_comparison_stats(telemetry).collect()
    assert len(rows) == 3
    avgs = [r.avg_enginetemperature for r in rows]
    assert avgs == sorted(avgs, reverse=True)
