"""JSONL corpus source: schema-enforced read, corrupt-line quarantine,
parquet landing (sources/jsonl.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.sources.jsonl import (
    read_jsonl,
    to_parquet_documents,
)


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_read_jsonl_good_and_quarantine(spark, tmp_path):
    f = tmp_path / "docs.jsonl"
    _write_lines(f, [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}',
        'this is not json at all',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "b"}',
        '{"doc_id": 3, "text": "truncated...',
    ])
    good, bad = read_jsonl(spark, str(f))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "hello world" and rows[2]["lang"] == "fr"
    quarantined = [r["raw_line"] for r in bad.collect()]
    assert len(quarantined) == 2
    assert "this is not json at all" in quarantined


def test_jsonl_to_parquet_feeds_operators(spark, tmp_path):
    f = tmp_path / "docs.jsonl"
    _write_lines(f, [
        '{"doc_id": 1, "text": "the cat sat", "lang": "en", "source": "a"}',
        '{"doc_id": 2, "text": "the cat sat", "lang": "en", "source": "a"}',
    ])
    good, _ = read_jsonl(spark, str(f))
    out = str(tmp_path / "docs.parquet")
    to_parquet_documents(good, out)
    docs = spark.read.parquet(out)
    assert docs.filter(F.col("n_chars") == 11).count() == 2
    # the landed table drives the dedup operators directly
    from stock_data_etl_pipeline_spark.operators.dedup import exact_dedup
    survivors = exact_dedup(docs).collect()
    assert len(survivors) == 1 and survivors[0]["dup_count"] == 2
