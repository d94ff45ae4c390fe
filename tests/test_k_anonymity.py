"""k_anonymity: quasi-identifier group-size audit. Hand-built risky and
safe corpora, NULL-combination groups, empty table, arg contracts."""

import pytest

from evalidate_spark.operators import table_checks

SCHEMA = "age string, zip string"


def run(spark, rows, k=3):
    df = spark.createDataFrame(rows, SCHEMA)
    return table_checks.k_anonymity(df, ["age", "zip"], k=k).first()


def test_risky_groups(spark):
    rows = (
        [("30", "111")] * 4          # safe group
        + [("40", "222")] * 2        # small group (2 < 3)
        + [("50", "333")]            # singleton
    )
    r = run(spark, rows)
    assert (r.n_rows, r.n_groups, r.min_group_size) == (7, 3, 1)
    assert (r.n_small_groups, r.n_rows_at_risk, r.k_anonymous) == (2, 3, False)


def test_all_safe(spark):
    r = run(spark, [("30", "111")] * 3 + [("40", "222")] * 5)
    assert (r.n_small_groups, r.n_rows_at_risk, r.k_anonymous) == (0, 0, True)


def test_null_combination_is_a_group(spark):
    # two rows sharing (NULL, '1') are one group of 2; NULL is visible
    r = run(spark, [(None, "1"), (None, "1"), ("x", None)], k=2)
    assert r.n_groups == 2
    assert r.n_small_groups == 1 and r.n_rows_at_risk == 1


def test_empty_table(spark):
    r = run(spark, [])
    assert (r.n_rows, r.n_groups, r.n_small_groups, r.n_rows_at_risk) == (0, 0, 0, 0)
    assert r.min_group_size is None and r.k_anonymous is True


def test_bad_args(spark):
    df = spark.createDataFrame([("a", "b")], SCHEMA)
    with pytest.raises(ValueError):
        table_checks.k_anonymity(df, [])
    with pytest.raises(ValueError):
        table_checks.k_anonymity(df, ["age"], k=1)
