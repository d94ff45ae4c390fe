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


class TestRangeJoin:
    def _sides(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        at = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
        left = spark.createDataFrame(
            [(1, 1, at(50)), (2, 1, at(250)), (3, 2, at(50)), (4, 1, None)],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [
                (10, 1, at(0), at(100)),     # contains e1 (user 1)
                (11, 1, at(40), at(60)),     # also contains e1
                (12, 2, at(0), at(100)),     # contains e3 (user 2)
                (13, 1, at(300), at(200)),   # inverted: never matches
                (14, 1, None, at(400)),      # NULL bound: never matches
            ],
            "order_id long, user_id long, t_start timestamp, t_end timestamp",
        )
        return left, right

    def test_equi_plus_range(self, spark):
        from evalidate_spark.operators.asof import range_join

        left, right = self._sides(spark)
        out = range_join(
            left, right, "ts", "t_start", "t_end", on=["user_id"],
            value_cols=["order_id"],
        )
        got = sorted((r.event_id, r.order_id) for r in out.collect())
        assert got == [(1, 10), (1, 11), (3, 12)]

    def test_bucketed_path_identical(self, spark):
        from evalidate_spark.operators.asof import range_join

        left, right = self._sides(spark)
        plain = range_join(
            left, right, "ts", "t_start", "t_end", on=["user_id"],
            value_cols=["order_id"],
        )
        bucketed = range_join(
            left, right, "ts", "t_start", "t_end", on=["user_id"],
            value_cols=["order_id"], bucket=30,
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, bucketed.collect())
        )

    def test_no_keys_requires_bucket_and_no_nested_loop(self, spark):
        import pytest as _pytest

        from evalidate_spark.operators.asof import range_join

        left, right = self._sides(spark)
        with _pytest.raises(ValueError, match="bucket"):
            range_join(left, right, "ts", "t_start", "t_end")
        out = range_join(
            left, right, "ts", "t_start", "t_end", bucket=60,
            value_cols=["order_id"],
        )
        # keyless: e1 matches 10,11 (user ignored) and 12; e3 same; e2 none
        got = sorted((r.event_id, r.order_id) for r in out.collect())
        assert got == [(1, 10), (1, 11), (1, 12), (3, 10), (3, 11), (3, 12)]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan

    def test_boundaries_inclusive(self, spark):
        from evalidate_spark.operators.asof import range_join

        left = spark.createDataFrame([(1, 0), (2, 100), (3, 101)], "id long, p long")
        right = spark.createDataFrame([(9, 0, 100)], "rid long, s long, e long")
        out = range_join(
            left, right, "p", "s", "e", bucket=7, value_cols=["rid"]
        )
        assert sorted(r.id for r in out.collect()) == [1, 2]

    def test_bad_args(self, spark):
        import pytest as _pytest

        from evalidate_spark.operators.asof import range_join

        left, right = self._sides(spark)
        with _pytest.raises(ValueError, match="collide"):
            range_join(
                left, right, "ts", "t_start", "t_end", on=["user_id"],
                value_cols=["event_id"],
            )
        with _pytest.raises(ValueError, match="positive"):
            range_join(
                left, right, "ts", "t_start", "t_end", on=["user_id"], bucket=0
            )
