"""golden_check: the deploy-time golden-row self-test. A pinned corpus
with expected verdicts — mismatches surface rule regressions; NULL
expectations are themselves mismatches; duplicate golden ids are fine."""

import pytest

from evalidate_spark import golden_check
from evalidate_spark.spec import Allowed, Rule, Size, Type

RULES = [
    Rule(key="name", presence="required",
         validators=[Type("binary"), Size(3, 10)]),
    Rule(key="kind", presence="required", validators=[Allowed(["a", "b"])]),
]

SCHEMA = "gid long, name string, kind string, expect_pass boolean"

GOLDEN = [
    (1, "hello", "a", True),      # passes, expected pass
    (2, "xy", "a", False),        # size fail, expected fail
    (3, None, "b", False),        # required fail, expected fail
    (4, "world", "z", False),     # allowed fail, expected fail
]


def run(spark, rows, rules=RULES):
    df = spark.createDataFrame(rows, SCHEMA)
    return golden_check(df, rules, id_cols=["gid"]).collect()


def test_clean_deploy_is_empty(spark):
    assert run(spark, GOLDEN) == []


def test_loosened_rule_surfaces(spark):
    # someone widened the size bound: golden row 2 now PASSES unexpectedly
    loosened = [
        Rule(key="name", presence="required",
             validators=[Type("binary"), Size(1, 10)]),
        Rule(key="kind", presence="required", validators=[Allowed(["a", "b"])]),
    ]
    got = run(spark, GOLDEN, loosened)
    assert len(got) == 1
    (m,) = got
    assert (m.gid, m.expect_pass, m.got_pass, m.n_violations) == (2, False, True, 0)
    assert m.first_message is None


def test_tightened_rule_surfaces(spark):
    tightened = RULES[:1] + [
        Rule(key="kind", presence="required", validators=[Allowed(["b"])])
    ]
    got = {m.gid: m for m in run(spark, GOLDEN, tightened)}
    # row 1 ('a') now fails though expected to pass
    assert got[1].expect_pass is True and got[1].got_pass is False
    assert got[1].n_violations == 1 and "allowed" in got[1].first_message


def test_null_expectation_is_a_mismatch(spark):
    got = run(spark, GOLDEN + [(5, "hello", "a", None)])
    assert [m.gid for m in got] == [5]


def test_duplicate_golden_ids_ok(spark):
    got = run(spark, GOLDEN + [(1, "hello", "a", True)])
    assert got == []


def test_missing_expect_col_raises(spark):
    df = spark.createDataFrame([(1, "x", "a")], "gid long, name string, kind string")
    with pytest.raises(ValueError):
        golden_check(df, RULES, id_cols=["gid"])
