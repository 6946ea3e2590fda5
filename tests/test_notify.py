"""Notification payload parity (functions/notify.py vs reference
send_discord_notification.py: colors, titles, field sections,
truncation, skip/err paths)."""

from __future__ import annotations

from datetime import datetime

from stock_data_etl_pipeline_spark.functions import notify as N


def _run(**over):
    base = {
        "id": "run-1", "ticker": "AAPL", "state": "FAILED",
        "error_code": "API_ERROR", "error_message": "boom",
        "requested_by": "alice", "request_id": "req-9",
        "created_at": datetime(2024, 1, 1, 10, 0, 0),
        "updated_at": datetime(2024, 1, 1, 10, 5, 0),
        "failed_at": datetime(2024, 1, 1, 10, 5, 0),
        "queued_for_fetch_at": datetime(2024, 1, 1, 10, 0, 0),
        "fetching_started_at": datetime(2024, 1, 1, 10, 1, 0),
        "fetching_finished_at": None, "queued_for_delta_at": None,
        "delta_started_at": None, "delta_finished_at": None,
        "raw_data_uri": "s3://raw/x", "processed_data_uri": None,
    }
    base.update(over)
    return base


def test_state_embed_colors_and_titles():
    done = N.state_embed("r", "AAPL", "DONE")
    assert done["color"] == 0x00FF00
    assert done["title"] == "AAPL - Ingestion Complete"
    failed = N.state_embed("r", "AAPL", "FAILED")
    assert failed["color"] == 0xFF0000
    prog = N.state_embed("r", "AAPL", "QUEUED_FOR_FETCH")
    assert prog["color"] == 0xFFFF00
    assert prog["title"] == "AAPL - Queued For Fetch"
    assert prog["description"].endswith("is in progress.")
    # base fields: Ticker/State inline, Run ID not
    assert [(f["name"], f["inline"]) for f in prog["fields"]] == [
        ("Ticker", True), ("State", True), ("Run ID", False)]


def test_failed_embed_sections_and_formats():
    e = N.failed_run_embed(_run())
    names = [f["name"] for f in e["fields"]]
    assert names == ["Ticker", "State", "Run ID", "Error Details",
                     "Request Information", "Timestamps",
                     "Pipeline Phases", "Data Locations"]
    err = next(f for f in e["fields"] if f["name"] == "Error Details")
    assert err["value"] == "**Code:** API_ERROR\n**Message:** boom"
    ts = next(f for f in e["fields"] if f["name"] == "Timestamps")
    assert "**Created:** 2024-01-01 10:00:00 UTC" in ts["value"]
    ph = next(f for f in e["fields"] if f["name"] == "Pipeline Phases")
    # only stamped phases appear, in pipeline order
    assert ph["value"].splitlines() == [
        "**Queued for Fetch:** 2024-01-01 10:00:00 UTC",
        "**Fetching Started:** 2024-01-01 10:01:00 UTC"]
    assert e["timestamp"] == "2024-01-01T10:05:00"


def test_failed_embed_truncates_and_omits_empty_sections():
    e = N.failed_run_embed(_run(error_message="x" * 2000,
                                requested_by=None, request_id=None,
                                raw_data_uri=None, processed_data_uri=None))
    err = next(f for f in e["fields"] if f["name"] == "Error Details")
    msg = err["value"].split("**Message:** ")[1]
    assert len(msg) == 1000 and msg.endswith("...")
    names = [f["name"] for f in e["fields"]]
    assert "Request Information" not in names
    assert "Data Locations" not in names


def test_notify_skips_without_webhook_and_reports_http_errors():
    r = N.notify_state_change(_run(), url=None)
    assert r == {"run_id": "run-1", "ticker": "AAPL", "state": "FAILED",
                 "notification_sent": False, "skipped": True,
                 "reason": "webhook_not_configured"}

    seen = {}

    def post(url, payload):
        seen["url"], seen["payload"] = url, payload
        return 204

    ok = N.notify_state_change(_run(), url="http://hook", thread_id="t7",
                               post=post)
    assert ok["notification_sent"] is True
    assert seen["url"] == "http://hook?thread_id=t7"
    assert list(seen["payload"]) == ["embeds"]
    assert seen["payload"]["embeds"][0]["color"] == 0xFF0000

    bad = N.notify_state_change(_run(state="DONE"), url="http://hook",
                                post=lambda u, p: 401)
    assert bad["notification_sent"] is False and bad["reason"] == "http_401"

    def boom(u, p):
        raise ConnectionError("down")

    err = N.notify_state_change(_run(), url="http://hook", post=boom)
    assert err["notification_sent"] is False
    assert err["reason"] == "unexpected_error"
