"""Point-in-time as-of join: backward inclusive-tie semantics, tolerance,
NULL passthrough, DuckDB ASOF JOIN parity, single-exchange plan."""

import duckdb
import pytest

from pyspark.sql import functions as F

from evalidate_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "2026-01-01 10:00:00", "a"),
            (1, "2026-01-01 12:00:00", "b"),  # ties with snapshot at 12:00
            (1, "2026-01-01 09:00:00", "c"),  # before any snapshot
            (2, "2026-01-01 10:30:00", "d"),
            (None, "2026-01-01 10:30:00", "e"),  # NULL key passes through
            (3, None, "f"),  # NULL ts passes through
        ],
        "k long, ts_s string, tag string",
    ).selectExpr("k", "cast(ts_s as timestamp_ntz) ts", "tag")
    right = spark.createDataFrame(
        [
            (1, "2026-01-01 09:30:00", 10),
            (1, "2026-01-01 12:00:00", 20),
            (2, "2026-01-01 08:00:00", 30),
            (None, "2026-01-01 00:00:00", 99),  # NULL-key snapshot never matches
        ],
        "k long, eff_s string, v int",
    ).selectExpr("k", "cast(eff_s as timestamp_ntz) eff", "v")
    return left, right


def test_asof_semantics(spark, sides):
    left, right = sides
    got = {r["tag"]: r["v"] for r in asof_join(left, right, "k", "ts", "eff").collect()}
    assert got == {"a": 10, "b": 20, "c": None, "d": 30, "e": None, "f": None}


def test_asof_tolerance(spark, sides):
    left, right = sides
    # 1h staleness: 'a' (30 min old) survives, 'd' (2.5h old) is nulled
    got = {
        r["tag"]: (r["v"], r["__asof_ts"])
        for r in asof_join(left, right, "k", "ts", "eff", tolerance_s=3600).collect()
    }
    assert got["a"][0] == 10 and got["a"][1] is not None
    assert got["b"][0] == 20
    assert got["d"] == (None, None)


def test_asof_value_col_clash_raises(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "tag"), "k", "ts", "eff")


def _features(spark):
    """Daily per-user rollups effective the NEXT day (no label leakage)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    daily = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id", F.date_trunc("DAY", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_day"), F.max("value").alias("max_val"))
    )
    return ev, daily.select(
        "user_id",
        F.col("day").cast("timestamp_ntz") + F.expr("interval 1 day"),
        "n_day",
        "max_val",
    ).toDF("user_id", "eff_ts", "n_day", "max_val")


def test_asof_matches_duckdb(spark):
    ev, feat = _features(spark)
    out = asof_join(ev, feat, "user_id", "ts", "eff_ts", ["n_day", "max_val"])
    got = sorted(
        (r["event_id"], r["n_day"], r["max_val"]) for r in out.collect()
    )
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                f"""WITH ev AS (SELECT * FROM '{SF}/events.parquet'),
                daily AS (
                  SELECT user_id, date_trunc('day', ts) AS day,
                         count(*) AS n_day, max(value) AS max_val
                  FROM ev WHERE user_id IS NOT NULL GROUP BY 1, 2),
                feat AS (SELECT user_id, day + INTERVAL 1 DAY AS eff_ts,
                                n_day, max_val FROM daily)
                SELECT e.event_id, f.n_day, f.max_val
                FROM ev e ASOF LEFT JOIN feat f
                  ON e.user_id = f.user_id AND e.ts >= f.eff_ts
                ORDER BY 1, 2, 3"""
            ).fetchall(),
        )
    )
    assert got == want and len(got) == 1000
    assert sum(1 for _, n, _ in got if n is not None) > 100  # real matches


def test_asof_plan_single_exchange(spark):
    """The whole as-of join is one hash shuffle + sort — no join node, no
    row multiplication, no extra exchange."""
    ev, feat = _features(spark)
    # feat's own groupBy shuffle is upstream prep, not the join; measure the
    # join itself on pre-materialized sides
    left = ev.localCheckpoint(eager=True)
    right = feat.localCheckpoint(eager=True)
    plan = asof_join(
        left, right, "user_id", "ts", "eff_ts", ["n_day", "max_val"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
