"""embedding_health: the one-row vector-corpus gate. Counters are checked
against a hand-built corpus covering every pathology (NULL vector, empty,
wrong width, NULL element, NaN, ±Inf, zero-norm, zeros-and-NULLs), plus
the empty-table contract and the single-exchange plan shape."""

import pytest

from evalidate_spark.operators import table_checks

SCHEMA = "vec_id long, embedding array<float>"

CORPUS = [
    (0, [1.0, 2.0, 3.0]),            # healthy
    (1, [0.5, -0.5, 0.25]),          # healthy
    (2, None),                       # NULL vector
    (3, []),                         # empty (also wrong-dim? no: len 0 != 3 -> wrong_dim counts it)
    (4, [1.0, 2.0]),                 # wrong width
    (5, [1.0, None, 0.0]),           # NULL element
    (6, [float("nan"), 1.0, 2.0]),   # NaN
    (7, [float("inf"), 1.0, 2.0]),   # +Inf
    (8, [-float("inf"), 1.0, 2.0]),  # -Inf
    (9, [0.0, 0.0, 0.0]),            # zero-norm
    (10, [0.0, None, 0.0]),          # zeros-and-NULLs: null_elem, NOT zero-norm
]


def report(spark, rows, dim=3):
    df = spark.createDataFrame(rows, SCHEMA)
    return table_checks.embedding_health(df, "embedding", expected_dim=dim).first()


def test_counters(spark):
    r = report(spark, CORPUS)
    assert r.n_rows == 11
    assert r.n_null_vec == 1
    assert r.n_empty_vec == 1
    # wrong width vs 3: the empty vec (len 0) and the 2-vec
    assert r.n_wrong_dim == 2
    assert r.min_dim == 0 and r.max_dim == 3
    assert r.n_null_elem == 2          # ids 5 and 10
    assert r.n_nonfinite == 3          # NaN, +Inf, -Inf
    assert r.n_zero_norm == 1          # id 9 only; id 10 has a NULL element


def test_healthy_only(spark):
    r = report(spark, [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])])
    assert (
        r.n_null_vec, r.n_empty_vec, r.n_wrong_dim,
        r.n_null_elem, r.n_nonfinite, r.n_zero_norm,
    ) == (0, 0, 0, 0, 0, 0)
    assert r.n_rows == 2 and r.min_dim == 3 and r.max_dim == 3


def test_empty_table(spark):
    r = report(spark, [])
    assert r.n_rows == 0
    assert r.n_null_vec == 0 and r.n_nonfinite == 0 and r.n_zero_norm == 0
    assert r.min_dim is None and r.max_dim is None


def test_all_null(spark):
    r = report(spark, [(0, None), (1, None)])
    assert r.n_rows == 2 and r.n_null_vec == 2
    assert r.min_dim is None and r.max_dim is None


def test_bad_dim_raises(spark):
    df = spark.createDataFrame([(0, [1.0])], SCHEMA)
    with pytest.raises(ValueError):
        table_checks.embedding_health(df, "embedding", expected_dim=0)


def test_single_aggregate_plan(spark):
    """Vectors never shuffle: exactly one Exchange (the 1-row final agg),
    no Window, no Generate in the physical plan."""
    df = spark.createDataFrame(CORPUS, SCHEMA)
    plan = table_checks.embedding_health(
        df, "embedding", expected_dim=3
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Generate" not in plan
