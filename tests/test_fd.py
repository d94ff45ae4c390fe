"""Functional-dependency discovery: hand-computed holds/violations,
NULL determinant/dependent contract, empty-table vacuity, unknown-column
errors, and the two-phase (no Expand) plan shape."""

import pytest

from evalidate_spark.operators.suggest import functional_dependencies

ROWS = [
    (1, "a", "x"),
    (1, "a", "y"),      # k=1: b has one image, c has two
    (2, "b", "x"),
    (2, "b", "x"),
    (3, None, "z"),     # NULL dependent is an image of its own...
    (3, None, "z"),
    (4, "d", None),
    (4, "d", "w"),      # ...so k=4 violates c: images {NULL, w}
    (None, "q", "q"),   # NULL determinant excluded entirely
]


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(ROWS, "k int, b string, c string")


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_fd_holds(tbl):
    r = _one(functional_dependencies(tbl, [("k", "b")]))
    assert r == dict(
        determinant="k", dependent="b", n_keys=4, violating_keys=0,
        max_images=1, holds=True,
    )


def test_fd_violations_counted(tbl):
    r = _one(functional_dependencies(tbl, [("k", "c")]))
    # k=1 → {x,y}, k=4 → {NULL,w} both violate; k=2 → {x}, k=3 → {z} hold
    assert r == dict(
        determinant="k", dependent="c", n_keys=4, violating_keys=2,
        max_images=2, holds=False,
    )


def test_fd_multiple_pairs_one_row_each(tbl):
    out = functional_dependencies(tbl, [("k", "b"), ("k", "c"), ("b", "k")])
    rows = {(r["determinant"], r["dependent"]): r["holds"] for r in out.collect()}
    assert rows == {("k", "b"): True, ("k", "c"): False, ("b", "k"): True}


def test_fd_empty_table_vacuously_holds(spark):
    empty = spark.createDataFrame([], "k int, b string")
    r = _one(functional_dependencies(empty, [("k", "b")]))
    assert r == dict(
        determinant="k", dependent="b", n_keys=0, violating_keys=0,
        max_images=0, holds=True,
    )


def test_fd_errors(tbl):
    with pytest.raises(ValueError):
        functional_dependencies(tbl, [])
    with pytest.raises(ValueError):
        functional_dependencies(tbl, [("k", "nope")])


def test_fd_plan_two_phase_no_expand(tbl):
    plan = (
        functional_dependencies(tbl, [("k", "c")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # explicit (det, dep) → det roll-up: no Expand node (the
    # count-DISTINCT rewrite that multiplies shuffle volume)
    assert "Expand" not in plan
