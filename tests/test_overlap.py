"""Theta-sketch overlap estimate: exact below the sketch's retention
threshold, NULL-key exclusion, disjoint/identical edges, and estimate
tolerance once sampling kicks in."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark.operators.table_checks import overlap_estimate


def _ids(spark, lo, hi, null_every=None):
    df = spark.range(lo, hi).select(F.concat(F.lit("d"), F.col("id")).alias("k"))
    if null_every:
        df = df.select(
            F.when(F.col("k").substr(2, 99).cast("long") % null_every != 0, F.col("k")).alias("k")
        )
    return df


def test_exact_small_overlap(spark):
    a = _ids(spark, 0, 300)       # d0..d299
    b = _ids(spark, 200, 500)     # d200..d499 → overlap 100, union 500
    r = overlap_estimate(a, b, "k").collect()[0]
    assert (r["n_a"], r["n_b"]) == (300, 300)
    assert r["n_intersection"] == 100
    assert r["n_union"] == 500
    assert r["jaccard_bp"] == 100 * 10_000 // 500


def test_duplicates_do_not_inflate(spark):
    a = _ids(spark, 0, 100).union(_ids(spark, 0, 100))
    b = _ids(spark, 50, 150)
    r = overlap_estimate(a, b, "k").collect()[0]
    assert r["n_a"] == 100 and r["n_intersection"] == 50


def test_null_keys_ignored(spark):
    a = spark.createDataFrame([("x",), (None,), ("y",)], "k string")
    b = spark.createDataFrame([(None,), ("y",)], "k string")
    r = overlap_estimate(a, b, "k").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_intersection"], r["n_union"]) == (2, 1, 1, 2)


def test_disjoint_and_empty(spark):
    a = _ids(spark, 0, 50)
    b = _ids(spark, 100, 150)
    r = overlap_estimate(a, b, "k").collect()[0]
    assert r["n_intersection"] == 0 and r["jaccard_bp"] == 0
    empty = a.filter(F.lit(False))
    r2 = overlap_estimate(empty, empty, "k").collect()[0]
    assert r2["n_union"] == 0 and r2["jaccard_bp"] is None


def test_numeric_key_coercion(spark):
    a = spark.range(0, 200).select(F.col("id").cast("int").alias("k"))
    b = spark.range(100, 300).select(F.col("id").cast("int").alias("k"))
    r = overlap_estimate(a, b, "k").collect()[0]
    assert r["n_intersection"] == 100


def test_estimate_tolerance_beyond_retention(spark):
    # 100k distinct per side, 50k shared — far beyond 4096 retained
    a = spark.range(0, 100_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(50_000, 150_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    r = overlap_estimate(a, b, "k").collect()[0]
    assert abs(r["n_a"] - 100_000) / 100_000 < 0.10
    assert abs(r["n_union"] - 150_000) / 150_000 < 0.10
    # intersection error compounds (union RSE / Jaccard): generous band
    assert 30_000 < r["n_intersection"] < 70_000
