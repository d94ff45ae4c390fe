"""value_shapes: shape-class profiling. Mapping matrix (digits, case,
punctuation, unicode, run collapse, cap), NULL/empty sentinels, top-k
cut with deterministic tie-break, share math."""

import pytest

from evalidate_spark.operators import table_checks

SCHEMA = "a string, b string"


def run(spark, rows, columns=("a",), top_k=10):
    df = spark.createDataFrame(rows, SCHEMA)
    out = table_checks.value_shapes(df, list(columns), top_k=top_k)
    return [(r.column, r.shape, r.n, r.share_bp) for r in out.collect()]


def test_shape_mapping(spark):
    got = dict(
        (row[1], row[2])
        for row in run(
            spark,
            [
                ("src7", None),
                ("2024-01-01", None),
                ("Hello World!", None),
                ("Ã©Ã©", None),          # non-ASCII run -> u+
                ("A1b", None),
                (None, None),
                ("", None),
                ("x" * 100, None),   # collapses to 'a+' long before the cap
            ],
        )
    )
    assert got == {
        "a+9": 1,
        "9+-9+-9+": 1,
        "Aa+ Aa+!": 1,
        "u+": 1,
        "A9a": 1,
        "<null>": 1,
        "<empty>": 1,
        "a+": 1,
    }


def test_topk_and_shares(spark):
    rows = [("aa", None)] * 6 + [("11", None)] * 3 + [("!", None)]
    got = run(spark, rows, top_k=2)
    # top-2 of three classes; shares over ALL 10 rows
    assert got == [("a", "a+", 6, 6000), ("a", "9+", 3, 3000)]


def test_tiebreak_shape_asc(spark):
    rows = [("aa", None), ("11", None)]
    got = run(spark, rows, top_k=1)
    assert got == [("a", "9+", 1, 5000)]


def test_multi_column_single_scan(spark):
    rows = [("x1", "YY")]
    got = set(run(spark, rows, columns=("a", "b")))
    assert got == {("a", "a9", 1, 10000), ("b", "A+", 1, 10000)}


def test_bad_args(spark):
    df = spark.createDataFrame([("x", "y")], SCHEMA)
    with pytest.raises(ValueError):
        table_checks.value_shapes(df, [])
    with pytest.raises(ValueError):
        table_checks.value_shapes(df, ["a"], top_k=0)
