"""HTTP serving shell tests (reference api/main.py + src/api.py behavior),
driven through Flask's test client — no socket, same session as the suite."""

from __future__ import annotations

import datetime as dt

import pytest

flask = pytest.importorskip("flask")

from sustainable_building_energy_benchmarking_pipeline_spark.api import create_app


@pytest.fixture(scope="module")
def client(spark):
    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        {
            "timestamp": t0 + dt.timedelta(minutes=5 * i),
            "zone_id": f"Z{i % 4 + 1}",
            "ahu_id": "AHU1",
            "metric": "temp_zone_c",
            "score": 1.0 + (i % 10) / 10,
            "rule_name": ["temp_drift", "clogged_filter"][i % 2],
            "severity": ["low", "medium", "high"][i % 3],
            "fault_type_label": "none",
        }
        for i in range(60)
    ]
    anomalies = spark.createDataFrame(pd.DataFrame(rows)).cache()
    app = create_app(spark, anomalies)
    app.config["TESTING"] = True
    return app.test_client()


def test_root_and_health(client):
    r = client.get("/")
    assert r.status_code == 200
    assert "/benchmark" in r.get_json()["endpoints"]
    h = client.get("/health")
    assert h.status_code == 200
    assert h.get_json()["status"] == "healthy"


def test_benchmark_scoring(client):
    # reference example: 50000 kWh / 1000 m2 -> EUI 50 -> Good
    r = client.post(
        "/benchmark",
        json={
            "building_id": "B001",
            "area": 1000.0,
            "energy_consumption": 50000.0,
            "building_type": "office",
        },
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["eui"] == 50.0
    assert body["performance_rating"] == "Good"
    assert len(body["recommendations"]) == 3


def test_benchmark_validation_422(client):
    r = client.post("/benchmark", json={"building_id": "B001", "area": "big"})
    assert r.status_code == 422
    assert any("area" in e for e in r.get_json()["detail"])


def test_alerts_filters_and_shape(client):
    r = client.get("/alerts?severity=high&limit=5")
    assert r.status_code == 200
    body = r.get_json()
    assert body["count"] == 5
    assert all(a["severity"] == "high" for a in body["anomalies"])
    # ISO timestamps, most recent first (src/api.py:183-190 behavior)
    ts = [dt.datetime.fromisoformat(a["timestamp"]) for a in body["anomalies"]]
    assert ts == sorted(ts, reverse=True)


def test_alerts_validation(client):
    assert client.get("/alerts?start=not-a-time").status_code == 400
    assert client.get("/alerts?severity=catastrophic").status_code == 400
    assert client.get("/alerts?limit=0").status_code == 422
    assert client.get("/alerts?limit=999999").status_code == 422


def test_alerts_time_window(client):
    r = client.get(
        "/alerts?start=2024-01-01T00:30:00&end=2024-01-01T01:00:00&limit=5000"
    )
    assert r.status_code == 200
    for a in r.get_json()["anomalies"]:
        t = dt.datetime.fromisoformat(a["timestamp"])
        assert dt.datetime(2024, 1, 1, 0, 30) <= t <= dt.datetime(2024, 1, 1, 1)


def test_summary_reference_shape(client):
    r = client.get("/alerts/summary")
    assert r.status_code == 200
    s = r.get_json()
    assert s["total"] == 60
    assert sum(rec["count"] for rec in s["by_severity"]) == 60
    counts = [rec["count"] for rec in s["by_severity"]]
    assert counts == sorted(counts, reverse=True)  # ORDER BY count DESC
    assert {rec["rule_name"] for rec in s["by_rule"]} == {
        "temp_drift", "clogged_filter",
    }
    assert len(s["by_zone"]) <= 10


def test_dashboard_html(client):
    """Server-rendered dashboard (reference src/dashboard_app.py parity):
    stat tiles + dimension tables + recent-anomaly table, filterable via
    the same query params as /alerts."""
    r = client.get("/dashboard")
    assert r.status_code == 200
    assert r.content_type.startswith("text/html")
    body = r.get_data(as_text=True)
    assert "Total Anomalies" in body and "Most Affected Zone" in body
    assert "temp_drift" in body or "clogged_filter" in body
    # filter narrows the table; validation is IDENTICAL to /alerts
    rf = client.get("/dashboard?severity=high&limit=3")
    assert rf.status_code == 200
    assert client.get("/dashboard?start=not-a-time").status_code == 400
    assert client.get("/dashboard?severity=bogus").status_code == 400
    assert client.get("/dashboard?limit=999999").status_code == 422


def test_dashboard_series_daily(client):
    """Daily-trend JSON series (reference dashboard_app.py:406-416):
    one point per date, counts matching a direct recompute, filter-aware."""
    r = client.get("/dashboard/series/daily")
    assert r.status_code == 200
    body = r.get_json()
    # fixture: 60 rows at 5-min spacing from 2024-01-01 → one date
    assert body["series"] == [{"date": "2024-01-01", "count": 60}]
    assert body["total"] == 60

    r = client.get("/dashboard/series/daily?severity=high")
    body = r.get_json()
    assert body["total"] == 20  # every third row is high
    assert [p["count"] for p in body["series"]] == [20]

    # shared validation contract with /alerts
    assert client.get("/dashboard/series/daily?start=not-a-ts").status_code == 400


def test_dashboard_series_zones(client):
    """Per-zone marker series keyed by severity (reference
    dashboard_app.py:143-163): each marker carries timestamp + rule +
    metric + score; zone_id is required."""
    r = client.get("/dashboard/series/zones?zone_id=Z1")
    assert r.status_code == 200
    body = r.get_json()
    assert body["zone_id"] == "Z1"
    # Z1 rows are i % 4 == 0 → i in 0,4,8,... severities cycle over i%3
    total = sum(len(v) for v in body["series"].values())
    assert total == 15
    for sev, pts in body["series"].items():
        assert sev in ("low", "medium", "high")
        for p in pts:
            assert set(p) == {"timestamp", "rule_name", "metric", "score"}
            assert p["rule_name"] == "temp_drift"  # Z1 rows are even i

    assert client.get("/dashboard/series/zones").status_code == 422
    assert (
        client.get("/dashboard/series/zones?zone_id=Z1&severity=bogus").status_code
        == 400
    )


def test_dashboard_svg_charts(client):
    """The dashboard embeds server-rendered SVG charts (the reference's
    plotly daily trend + per-zone severity markers,
    src/dashboard_app.py:147-152,374-416): a single-series daily line
    always; the marker chart only when a zone filter is given, with
    severity identity carried by shape + legend text (never color
    alone)."""
    body = client.get("/dashboard").get_data(as_text=True)
    assert 'aria-label="daily anomaly counts"' in body
    assert 'class="line"' in body and "<title>2024-01-01: " in body
    assert 'aria-label="zone anomaly markers"' not in body  # no zone filter

    zb = client.get("/dashboard?zone_id=Z1").get_data(as_text=True)
    assert 'aria-label="zone anomaly markers"' in zb
    # all three severities present with distinct shape classes
    for cls in ("sev-low", "sev-med", "sev-high"):
        assert f'class="{cls}"' in zb
    # shape legend names the severities in text
    assert "medium (diamond)" in zb and "high (triangle)" in zb
    # every marker has a text tooltip naming its severity
    assert zb.count("<title>") > 10


def test_daily_series_over_window_422(spark):
    """Round-5 directive #6: a date window spanning more daily points
    than MAX_DAILY_POINTS must 422, never feed an unbounded collect —
    the plan-side LIMIT caps the scan at MAX_DAILY_POINTS+1 rows."""
    import pandas as pd

    from sustainable_building_energy_benchmarking_pipeline_spark.plans import serving

    t0 = dt.datetime(2020, 1, 1)
    wide = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "timestamp": t0 + dt.timedelta(days=i),
                    "zone_id": "Z1",
                    "ahu_id": "AHU1",
                    "metric": "temp_zone_c",
                    "score": 1.0,
                    "rule_name": "temp_drift",
                    "severity": "low",
                    "fault_type_label": "none",
                }
                for i in range(serving.MAX_DAILY_POINTS + 5)
            ]
        )
    ).cache()
    app = create_app(spark, wide)
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.get("/dashboard/series/daily")
    assert r.status_code == 422
    assert "narrow" in r.get_json()["detail"]
    # /dashboard shares the same guard
    r2 = c.get("/dashboard")
    assert r2.status_code == 422
    # narrowing the window restores 200
    r3 = c.get("/dashboard/series/daily?start=2020-01-01T00:00:00&end=2020-03-01T00:00:00")
    assert r3.status_code == 200
    assert r3.get_json()["total"] > 0
    wide.unpersist()


def test_alerts_z_suffix_is_utc(client, spark):
    """A trailing 'Z' is an explicit UTC offset, not decoration: under a
    non-UTC session timezone the window must select the same INSTANTS a
    naive query selects under UTC (stripping the Z would shift the
    window by the session offset)."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        pytest.skip("fixture instants assume a UTC session")
    url = "/alerts?start=2024-01-01T00:30:00{z}&end=2024-01-01T01:00:00{z}&limit=5000"
    want = {
        (a["zone_id"], a["severity"], a["score"])
        for a in client.get(url.format(z="")).get_json()["anomalies"]
    }
    assert want  # the window is non-empty by construction
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        got = {
            (a["zone_id"], a["severity"], a["score"])
            for a in client.get(url.format(z="Z")).get_json()["anomalies"]
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == want
