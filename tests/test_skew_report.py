"""Skew/heavy-hitter report: exact counts and shares, deterministic
tiebreak, NULL exclusion, hot flag threshold, multi-column union,
TakeOrdered (not single-task window) plan shape."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark.operators.table_checks import skew_report


@pytest.fixture(scope="module")
def skewed(spark):
    # 80 rows of user 7, 15 of user 3, 5 singles, plus NULLs
    rows = (
        [(7, "view")] * 80
        + [(3, "buy")] * 15
        + [(i, "view") for i in (10, 11, 12, 13, 14)]
        + [(None, "view")] * 10
    )
    return spark.createDataFrame(rows, "user_id int, event_type string")


def test_counts_shares_and_hot_flag(skewed):
    out = skew_report(skewed, ["user_id"], top_k=3, hot_bp=1000).collect()
    assert [r["value"] for r in out] == ["7", "3", "10"]
    by = {r["value"]: r for r in out}
    assert by["7"]["cnt"] == 80 and by["7"]["share_bp"] == 8000
    assert by["3"]["share_bp"] == 1500
    # exactly floor(1*10000/100) = 100 bp, below the 10% threshold
    assert by["10"]["cnt"] == 1 and by["10"]["share_bp"] == 100
    assert [r["is_hot"] for r in out] == [True, True, False]


def test_nulls_excluded_from_total(skewed):
    # total = 100 non-NULL rows, not 110
    r = skew_report(skewed, ["user_id"], top_k=1).collect()[0]
    assert r["share_bp"] == 8000


def test_tiebreak_value_ascending(skewed):
    out = skew_report(skewed, ["user_id"], top_k=5).collect()
    # the four singleton users tie on cnt=1 → value-ascending
    assert [r["value"] for r in out[2:]] == ["10", "11", "12"]


def test_multi_column_union(skewed):
    out = skew_report(skewed, ["user_id", "event_type"], top_k=2).collect()
    cols = [r["column"] for r in out]
    assert cols == ["user_id"] * 2 + ["event_type"] * 2
    et = {r["value"]: r["cnt"] for r in out if r["column"] == "event_type"}
    # event_type has no NULLs filtered here: 95 views (incl. NULL users), 15 buys
    assert et == {"view": 95, "buy": 15}


def test_errors(skewed):
    with pytest.raises(ValueError):
        skew_report(skewed, [])
    with pytest.raises(ValueError):
        skew_report(skewed, ["nope"])


def test_plan_takeordered_no_window(skewed):
    plan = (
        skew_report(skewed, ["user_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
