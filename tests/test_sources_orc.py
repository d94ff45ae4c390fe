"""ORC source/sink: read_table/write_table fmt routing — roundtrip,
dynamic partition overwrite semantics, pushdown-visible scan, and
bad-arg contracts."""

import os

import pytest
from pyspark.sql import functions as F

from evalidate_spark import sources


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("part"), F.lit("x").alias("s")
    )
    sources.write_table(df, p, mode="overwrite", fmt="orc")
    back = sources.read_table(spark, p, fmt="orc")
    assert back.count() == 100
    assert {f.name for f in back.schema.fields} == {"id", "part", "s"}


def test_orc_dynamic_partition_overwrite(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    df = spark.range(10).select("id", (F.col("id") % 2).alias("part"))
    sources.write_table(df, p, mode="overwrite", partition_by=["part"], fmt="orc")
    # rewrite ONLY partition 0 with a single row: partition 1 must survive
    one = spark.range(1).select(F.lit(999).alias("id"), F.lit(0).alias("part"))
    sources.write_table(one, p, mode="overwrite", partition_by=["part"], fmt="orc")
    back = sources.read_table(spark, p, fmt="orc")
    assert back.filter("part = 1").count() == 5
    assert back.filter("part = 0").count() == 1


def test_orc_filter_pushdown_in_plan(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    sources.write_table(
        spark.range(1000).select("id", (F.col("id") * 2).alias("v")),
        p, mode="overwrite", fmt="orc",
    )
    q = sources.read_table(spark, p, fmt="orc").filter(F.col("id") > 500).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,500)]" in plan
    assert "ReadSchema: struct<id:bigint>" in plan


def test_bad_fmt_and_snapshot(spark, tmp_path):
    df = spark.range(1)
    with pytest.raises(ValueError):
        sources.write_table(df, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        sources.read_table(spark, str(tmp_path / "x"), fmt="csv")
    with pytest.raises(ValueError):
        sources.read_table(spark, str(tmp_path / "x"), snapshot_id=3, fmt="orc")
