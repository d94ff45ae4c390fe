"""group_completeness: per-group null rates vs pooled others. Hand-built
bad-feed case, NULL-group exclusion, single-group contract, plan shape."""

import pytest

from evalidate_spark.operators import table_checks

SCHEMA = "src string, a string, b long"


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = table_checks.group_completeness(df, "src", ["a", "b"], **kw)
    return {(r.src, r.column): r for r in out.collect()}


def test_bad_feed_flagged(spark):
    rows = []
    # good feed: 10 rows, no NULLs; bad feed: 10 rows, 8 NULL a
    rows += [("good", "x", 1)] * 10
    rows += [("bad", None, 1)] * 8 + [("bad", "x", 1)] * 2
    got = run(spark, rows)
    bad_a = got[("bad", "a")]
    assert (bad_a.n_rows, bad_a.n_nulls, bad_a.null_bp) == (10, 8, 8000)
    assert bad_a.base_null_bp == 0 and bad_a.null_anomaly is True
    good_a = got[("good", "a")]
    # good's baseline pools the bad feed: 8/10 nulls elsewhere
    assert (good_a.null_bp, good_a.base_null_bp) == (0, 8000)
    assert good_a.null_anomaly is False
    assert got[("bad", "b")].null_anomaly is False


def test_null_group_excluded_and_single_group(spark):
    got = run(spark, [(None, None, None), ("only", "x", 1), ("only", None, 2)])
    assert set(got) == {("only", "a"), ("only", "b")}
    r = got[("only", "a")]
    assert (r.n_rows, r.n_nulls, r.null_bp) == (2, 1, 5000)
    assert r.base_null_bp is None and r.null_anomaly is False


def test_bad_args(spark):
    df = spark.createDataFrame([("s", "x", 1)], SCHEMA)
    with pytest.raises(ValueError):
        table_checks.group_completeness(df, "src", [])
    with pytest.raises(ValueError):
        table_checks.group_completeness(df, "src", ["a"], jump_bp=0)


def test_one_data_shuffle(spark):
    df = spark.createDataFrame([("s", "x", 1), ("t", None, 2)], SCHEMA)
    plan = (
        table_checks.group_completeness(df, "src", ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the counts table is localCheckpoint-pinned: the final plan reads
    # the tiny checkpointed RDD (its one group-agg shuffle runs inside
    # the checkpoint lineage, once); no hash exchange may remain here
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange SinglePartition") == 1  # the 1-row totals
