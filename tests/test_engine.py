from __future__ import annotations

import pytest

from machine_telemetry_etl_ml_pipeline_spark.engine import TelemetryEngine


@pytest.fixture(scope="module")
def engine(spark, telemetry_csv, tmp_path_factory):
    eng = TelemetryEngine(str(tmp_path_factory.mktemp("engine_root")), spark=spark)
    n = eng.ingest_csv(telemetry_csv)
    assert n > 0
    return eng


def test_facade_reads(engine):
    assert [r.machineid for r in engine.get_machine_list().collect()] == ["M001", "M002", "M003"]
    latest = engine.get_latest_telemetry("M002", limit=1).collect()
    assert len(latest) == 1 and latest[0].machineid == "M002"
    top = engine.get_highest_temperature_machines(limit=2).collect()
    assert len(top) == 2
    stats = engine.get_telemetry_stats().head()
    assert stats.n_machines == 3


def test_facade_status_and_comparison(engine):
    by_status = engine.get_machines_by_status("fault").collect()
    assert all("fault" in r.status.lower() for r in by_status)
    comp = engine.get_machine_comparison_stats().collect()
    assert len(comp) == 3


def test_facade_write_paths(engine):
    engine.log_user_query("operator", "hottest machine?", "regression", confidence=None)
    engine.log_prediction("M001", "regression", 81.2, {"humidity": 68.0})
    counts = engine.verify_database_setup()
    assert counts["user_query_log"] >= 1 and counts["predictions"] >= 1
    # None confidence coerced to 0.0 (reference db.py:168)
    q = engine._read_or_empty("user_query_log").head()
    assert q.confidence == 0.0 and q.ts_epoch is not None


def test_facade_insert_and_sql(engine):
    before = engine.verify_database_setup()["telemetry"]
    engine.insert_telemetry(
        {
            "machineid": "M009",
            "type": "Generator",
            "location": "Site D",
            "timestamp": "9/15/2025 4:00",
            "enginetemperature": 90.5,
            "status": "Active",
        }
    )
    after = engine.verify_database_setup()["telemetry"]
    assert after == before + 1
    got = engine.execute_query(
        "SELECT machineid, enginetemperature FROM telemetry WHERE machineid = 'M009'"
    ).collect()
    assert len(got) == 1 and got[0].enginetemperature == 90.5
