"""Run-state notification payloads (Discord-webhook-shaped).

Parity target: /root/reference/services/workers/tasks/
send_discord_notification.py — after a state transition commits, the
reference posts a color-coded embed (DONE green, FAILED red, in-progress
yellow; :173-231), with a comprehensive variant for failures carrying
error details, request metadata, lifecycle + per-phase timestamps and
data locations (:233-368), wrapped as {"embeds": [...]} (:383-386) and
addressed to webhook?thread_id=... when a thread is configured
(:104-107). Unconfigured webhook -> skipped result, reason
'webhook_not_configured' (:88-101).

Here the formatter is pure functions over a run row (dict or Row.asDict)
so it composes with StockLake's on-FAILED callback and with any batch of
runs (format a million failure payloads executor-side via a UDF if ever
needed); the HTTP post is transport-injectable like sources/fetch.py.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime

COLOR_DONE = 0x00FF00
COLOR_FAILED = 0xFF0000
COLOR_IN_PROGRESS = 0xFFFF00

_FOOTER = {"text": "Stock Ingestion Pipeline"}
_PHASE_LABELS = [
    ("queued_for_fetch_at", "Queued for Fetch"),
    ("fetching_started_at", "Fetching Started"),
    ("fetching_finished_at", "Fetching Finished"),
    ("queued_for_delta_at", "Queued for Delta"),
    ("delta_started_at", "Delta Started"),
    ("delta_finished_at", "Delta Finished"),
]


def _ts(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%d %H:%M:%S UTC")


def _base_fields(run_id: str, ticker: str, state: str) -> list[dict]:
    return [
        {"name": "Ticker", "value": ticker, "inline": True},
        {"name": "State", "value": state, "inline": True},
        {"name": "Run ID", "value": str(run_id), "inline": False},
    ]


def state_embed(run_id: str, ticker: str, state: str) -> dict:
    """Basic embed for any state change (reference :173-231)."""
    if state == "DONE":
        color, title = COLOR_DONE, f"{ticker} - Ingestion Complete"
        desc = f"Stock ingestion for {ticker} has completed successfully."
    elif state == "FAILED":
        color, title = COLOR_FAILED, f"{ticker} - Ingestion Failed"
        desc = f"Stock ingestion for {ticker} has failed."
    else:
        color = COLOR_IN_PROGRESS
        title = f"{ticker} - {state.replace('_', ' ').title()}"
        desc = f"Stock ingestion for {ticker} is in progress."
    return {"title": title, "description": desc, "color": color,
            "fields": _base_fields(run_id, ticker, state),
            "footer": dict(_FOOTER)}


def failed_run_embed(run: dict) -> dict:
    """Comprehensive failure embed from a full run row (reference
    :233-368): error details (message truncated to Discord's 1024-char
    field limit), request metadata, lifecycle + phase timestamps and data
    locations — each section present only when it has content."""
    ticker = run["ticker"]
    fields = _base_fields(run["id"], ticker, run["state"])

    err = []
    if run.get("error_code"):
        err.append(f"**Code:** {run['error_code']}")
    if run.get("error_message"):
        msg = run["error_message"]
        if len(msg) > 1000:
            msg = msg[:997] + "..."
        err.append(f"**Message:** {msg}")
    if err:
        fields.append({"name": "Error Details", "value": "\n".join(err),
                       "inline": False})

    req = []
    if run.get("requested_by"):
        req.append(f"**Requested By:** {run['requested_by']}")
    if run.get("request_id"):
        req.append(f"**Request ID:** {run['request_id']}")
    if req:
        fields.append({"name": "Request Information",
                       "value": "\n".join(req), "inline": False})

    life = []
    if run.get("created_at"):
        life.append(f"**Created:** {_ts(run['created_at'])}")
    if run.get("updated_at"):
        life.append(f"**Last Updated:** {_ts(run['updated_at'])}")
    if run.get("failed_at"):
        life.append(f"**Failed At:** {_ts(run['failed_at'])}")
    if life:
        fields.append({"name": "Timestamps", "value": "\n".join(life),
                       "inline": False})

    phases = [f"**{label}:** {_ts(run[col])}"
              for col, label in _PHASE_LABELS if run.get(col)]
    if phases:
        fields.append({"name": "Pipeline Phases",
                       "value": "\n".join(phases), "inline": False})

    locs = []
    if run.get("raw_data_uri"):
        locs.append(f"**Raw Data:** {run['raw_data_uri']}")
    if run.get("processed_data_uri"):
        locs.append(f"**Processed Data:** {run['processed_data_uri']}")
    if locs:
        fields.append({"name": "Data Locations", "value": "\n".join(locs),
                       "inline": False})

    stamp = run.get("failed_at") or run.get("updated_at")
    return {"title": f"{ticker} - Ingestion Failed",
            "description": f"Stock ingestion for {ticker} has failed.",
            "color": COLOR_FAILED, "fields": fields,
            "footer": dict(_FOOTER),
            "timestamp": stamp.isoformat() if stamp else None}


def webhook_payload(embed: dict) -> dict:
    """The POST body (reference :383-386)."""
    return {"embeds": [embed]}


def webhook_url(base_url: str, thread_id: str | None = None) -> str:
    """Thread routing (reference :104-107)."""
    return f"{base_url}?thread_id={thread_id}" if thread_id else base_url


def notify_state_change(run: dict, *, url: str | None,
                        thread_id: str | None = None,
                        post: Callable[[str, dict], int] | None = None) -> dict:
    """Format + deliver one state-change notification; returns the
    reference's result record. ``post(url, payload) -> status_code`` is
    injectable (tests / air-gapped runs); None with a configured url
    falls back to `requests` (import-gated). Unconfigured url -> skipped,
    like the reference's missing-webhook path; delivery errors are
    reported in the result, never raised (reference :140-170)."""
    run_id, ticker, state = str(run["id"]), run["ticker"], run["state"]
    result = {"run_id": run_id, "ticker": ticker, "state": state,
              "notification_sent": False, "skipped": False}
    if not url:
        result.update(skipped=True, reason="webhook_not_configured")
        return result
    embed = (failed_run_embed(run) if state == "FAILED"
             else state_embed(run_id, ticker, state))
    if post is None:
        import requests  # noqa: PLC0415 — gated: absent in some environments

        def post(u: str, payload: dict) -> int:  # noqa: PLR0206
            return requests.post(u, json=payload, timeout=10).status_code
    try:
        status = post(webhook_url(url, thread_id), webhook_payload(embed))
    except Exception:  # noqa: BLE001 — delivery failure is a result, not a raise
        result["reason"] = "unexpected_error"
        return result
    if 200 <= status < 300:
        result["notification_sent"] = True
    else:
        result["reason"] = f"http_{status}"
    return result
