"""Driver-verification window rotation.

The external gate checks only the first 50 registered catalog queries;
plans/__init__ orders the catalog so every family eventually gets a
driver row. Round 3 uses an explicit list; later rounds self-advance
from the CORRECTNESS_r*.json artifacts (red first, never-checked next,
green last)."""

from __future__ import annotations

import json

from stock_data_etl_pipeline_spark.plans import (_ROUND3_WINDOW, CATALOG,
                                                 _correctness_status)


def test_round3_window_is_the_catalog_prefix():
    assert list(CATALOG)[:len(_ROUND3_WINDOW)] == _ROUND3_WINDOW
    # the 8 event-time queries red in r02 (plus the reworked dedup sink)
    # are inside the externally-checked first 50
    for name in ("events_hourly", "events_sessionization",
                 "streaming_purchase_view_join", "streaming_dedup_survivors",
                 "q21_waiting_supplier", "corpus_span_dedup"):
        assert name in _ROUND3_WINDOW[:50]


def test_correctness_classifier(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True},
        "b": {"rows_match": False, "schema_match": True, "hash_match": False},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        # later round flips a -> red, b -> green
        "a": {"rows_match": True, "schema_match": True, "hash_match": False},
        "b": {"rows_match": True, "schema_match": True, "hash_match": True},
        # rows-only row (no oracle): hash_match absent counts as green
        "c": {"rows_match": True, "schema_match": True},
    }))
    latest, status = _correctness_status(str(tmp_path))
    assert latest == 2
    assert status == {"a": "red", "b": "green", "c": "green"}


def test_classifier_survives_bad_artifact(tmp_path):
    (tmp_path / "CORRECTNESS_r07.json").write_text("{not json")
    latest, status = _correctness_status(str(tmp_path))
    assert latest == 7 and status == {}
