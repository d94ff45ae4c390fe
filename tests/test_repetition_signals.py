"""repetition_signals: per-doc Gopher repetition gate. Hand-computed
coverages, NULL/empty/short contracts, clamping, whitespace
normalisation, and the zero-shuffle plan shape."""

import pytest

from evalidate_spark.functions import text

SCHEMA = "doc_id long, text string"


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = text.repetition_signals(df, top_ns=(2, 3), dup_n=5)
    return {r.doc_id: (r.top2_bp, r.top3_bp, r.dup5_bp) for r in out.collect()}


def test_hand_computed(spark):
    got = run(
        spark,
        [
            # "a b" x3 covers 9 of norm 11; "a b a" x2 covers 10; no dup 5-gram
            (0, "a b a b a b"),
            # degenerate: everything clamps to 10000
            (1, "c c c c c c c c"),
            # top2 = "w1 w2" x3 -> 15/29; top3 = "w1 w2 w3" x2 -> 16/29; dup5 = 0
            (2, "w1 w2 w3 w1 w2 w4 w1 w2 w3 w5"),
            # dup 5-gram "p q r s t" x2 -> 18/19; top2 = any x2 pair -> 6/19;
            # top3 = "p q r" x2 -> 10/19
            (3, "p q r s t p q r s t"),
        ],
    )
    assert got[0] == (8181, 9090, 0)
    assert got[1] == (10000, 10000, 10000)
    assert got[2] == (5172, 5517, 0)
    assert got[3] == (3157, 5263, 9473)


def test_contracts(spark):
    got = run(
        spark,
        [
            (0, None),          # NULL text -> NULL metrics
            (1, ""),            # zero tokens -> 0
            (2, "   \t "),      # whitespace-only -> 0
            (3, "one"),         # shorter than every n -> 0
            (4, "a  b\ta"),     # multi-space: norm = "a b a" (5 chars)
        ],
    )
    assert got[0] == (None, None, None)
    assert got[1] == (0, 0, 0)
    assert got[2] == (0, 0, 0)
    assert got[3] == (0, 0, 0)
    # 2-grams "a b", "b a" each once: cover 3 -> 6000; the single 3-gram
    # covers the whole normalised text -> 10000; no 5-gram
    assert got[4] == (6000, 10000, 0)


def test_bad_order_raises(spark):
    df = spark.createDataFrame([(0, "a b")], SCHEMA)
    with pytest.raises(ValueError):
        text.repetition_signals(df, top_ns=(1, 2))


def test_projection_only_plan(spark):
    df = spark.createDataFrame([(0, "a b a")], SCHEMA)
    plan = (
        text.repetition_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan and "Window" not in plan
