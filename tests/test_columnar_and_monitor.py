"""ORC columnar source (round trip + pushdown + partition pruning) and
the streaming DQ monitor."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators.quality import (
    UniqueRule, in_range, not_null)
from stock_data_etl_pipeline_spark.sources.columnar import (
    read_columnar, write_columnar)
from stock_data_etl_pipeline_spark.streaming.monitor import (
    streaming_dq_monitor)


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    path = str(tmp_path / "orc_tbl")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"),
        (F.col("id") * 1.5).alias("v"))
    write_columnar(df, path, fmt="orc")
    back = read_columnar(spark, path, fmt="orc")
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == 999 * 1000 // 2

    plan = (back.filter(F.col("id") > 990).select("id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan and "IsNotNull(id)" in plan, plan


def test_orc_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "orc_part")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("grp"))
    write_columnar(df, path, fmt="orc", partition_by=("grp",))
    back = read_columnar(spark, path, fmt="orc").filter(F.col("grp") == 2)
    assert back.count() == 25
    # partition pruning: only the grp=2 directory is listed
    files = {r[0] for r in
             back.select(F.input_file_name()).distinct().collect()}
    assert files and all("grp=2" in f for f in files)


def test_columnar_rejects_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError):
        write_columnar(spark.range(1), str(tmp_path / "x"), fmt="avro")


def test_streaming_dq_monitor_accumulates_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    audit = str(tmp_path / "audit")
    rules = [not_null("id"), in_range("v", lo=0),
             UniqueRule("id_unique", ("id",))]

    (spark.createDataFrame([(1, 1.0), (2, -5.0), (2, 3.0)],
                           "id long, v double")
     .coalesce(1).write.mode("append").parquet(src))
    out1 = streaming_dq_monitor(spark, src, cp, rules, audit)
    got1 = {r["constraint_name"]: r["violations"] for r in out1.collect()}
    assert got1 == {"id_not_null": 0, "v_in_range": 1, "id_unique": 1}

    # second run: only the NEW file is audited (checkpointed source),
    # and the audit log accumulates under a fresh batch id
    (spark.createDataFrame([(None, 2.0)], "id long, v double")
     .coalesce(1).write.mode("append").parquet(src))
    out2 = streaming_dq_monitor(spark, src, cp, rules, audit)
    rows = out2.collect()
    assert len(rows) == 6
    assert len({r["batch_id"] for r in rows}) == 2
    second = {r["constraint_name"]: (r["violations"], r["checked"])
              for r in rows if r["checked"] == 1}
    assert second["id_not_null"] == (1, 1)

    # third run with nothing new: no rows added
    out3 = streaming_dq_monitor(spark, src, cp, rules, audit)
    assert out3.count() == 6


def test_csv_round_trip_and_quarantine(spark, tmp_path):
    import pathlib

    from pyspark.sql import types as T

    from stock_data_etl_pipeline_spark.sources.csv import (
        read_csv, write_csv)
    schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("qty", T.LongType(), True)])
    src = tmp_path / "in.csv"
    src.write_text("id,name,qty\n"
                   "1,alpha,10\n"
                   "2,beta,notanumber\n"   # uncastable -> quarantine
                   "3,gamma,30\n")
    good, bad = read_csv(spark, str(src), schema)
    g = sorted((r["id"], r["name"], r["qty"]) for r in good.collect())
    assert g == [(1, "alpha", 10), (3, "gamma", 30)]
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert "notanumber" in quarantined[0]["raw_line"]
    # round trip: write the good split, read it back, same rows
    out = str(tmp_path / "out_csv")
    write_csv(good, out)
    back, bad2 = read_csv(spark, out, schema)
    assert sorted((r["id"], r["name"], r["qty"])
                  for r in back.collect()) == g
    assert bad2.count() == 0
    assert pathlib.Path(out).exists()
